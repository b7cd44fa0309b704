from .fetch import FetchParseStage, SeenFilterStage, add_hash_columns, admit_group

__all__ = ["FetchParseStage", "SeenFilterStage", "add_hash_columns", "admit_group"]
