from .vector import cosine_expr, dot_exact, sql_cosine, sql_dot

__all__ = ["cosine_expr", "dot_exact", "sql_cosine", "sql_dot"]
