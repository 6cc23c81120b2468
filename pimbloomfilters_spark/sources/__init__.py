from .tables import TABLES, load_table, token_table, token_table_oracle_cte
from .synthetic import generate_token_sequences

__all__ = [
    "TABLES",
    "load_table",
    "token_table",
    "token_table_oracle_cte",
    "generate_token_sequences",
]
