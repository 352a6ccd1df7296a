"""Declared query catalog (SURVEY.md §2). Importing this package registers
every query id into ``REGISTRY``."""

from .base import REGISTRY, Query, register  # noqa: F401

from . import flagship  # noqa: F401,E402


def all_queries() -> dict[str, Query]:
    return dict(REGISTRY)
