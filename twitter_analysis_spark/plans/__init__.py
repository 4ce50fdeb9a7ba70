from .memo import QueryMemo  # noqa: F401
