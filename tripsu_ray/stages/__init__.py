"""Dataset → Dataset transform stages."""
