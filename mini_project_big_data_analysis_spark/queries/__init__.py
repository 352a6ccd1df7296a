"""Declared query catalog (SURVEY.md §2). Importing this package registers
every query id into ``REGISTRY``."""

from .base import REGISTRY, Query, register  # noqa: F401

from . import flagship  # noqa: F401,E402
from . import sources_q  # noqa: F401,E402
from . import scalars_q  # noqa: F401,E402
from . import filters_q  # noqa: F401,E402
from . import aggregates_q  # noqa: F401,E402
from . import joins_q  # noqa: F401,E402
from . import advanced_q  # noqa: F401,E402
from . import windows_q  # noqa: F401,E402
from . import temporal_q  # noqa: F401,E402
from . import sql_q  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import ext_dedup_q  # noqa: F401,E402
from . import ext_similarity_q  # noqa: F401,E402
from . import ext_text_q  # noqa: F401,E402
from . import ext_multimodal_q  # noqa: F401,E402
from . import ext_pipeline_q  # noqa: F401,E402


def all_queries() -> dict[str, Query]:
    return dict(REGISTRY)
