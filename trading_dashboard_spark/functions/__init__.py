from .numeric import (  # noqa: F401
    lit_double_matrix, lit_doubles, portable_round_sql, pround,
)
