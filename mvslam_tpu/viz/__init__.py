"""Visualization & dashboards (reference L8)."""
