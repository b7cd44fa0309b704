from .readers import failures_table, read_accumulated_csv, read_pous_csv

__all__ = ["failures_table", "read_accumulated_csv", "read_pous_csv"]
