from .catalog import QUERIES, QuerySpec, register  # noqa: F401
