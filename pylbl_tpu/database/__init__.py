from . import fixtures  # noqa: F401

try:  # pragma: no cover - db module lands in a later milestone commit.
    from .db import Database  # noqa: F401
except ImportError:  # pragma: no cover
    pass
