"""Medallion pipeline layers: bronze → silver → gold → reports."""
