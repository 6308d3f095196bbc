from .hashing import h13, md5_int64
from .vector import cosine_expr, dot_exact, sql_cosine, sql_dot

__all__ = [
    "cosine_expr",
    "dot_exact",
    "h13",
    "md5_int64",
    "sql_cosine",
    "sql_dot",
]
