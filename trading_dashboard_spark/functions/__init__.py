from .numeric import pround, portable_round_sql  # noqa: F401
