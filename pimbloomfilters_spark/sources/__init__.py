from .bucketed import read_bucketed, write_bucketed
from .synthetic import generate_token_sequences
from .tables import TABLES, load_table, token_table, token_table_oracle_cte

__all__ = [
    "TABLES",
    "load_table",
    "token_table",
    "token_table_oracle_cte",
    "generate_token_sequences",
    "write_bucketed",
    "read_bucketed",
]
