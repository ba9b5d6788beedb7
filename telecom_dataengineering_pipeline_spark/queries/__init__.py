"""Named query registry — the single source of truth behind
``/root/repo/__spark_entry__.py``.

Importing this package imports every query module, which registers each query
(Spark callable + optional DuckDB oracle SQL) into ``REGISTRY``.
"""

from .registry import REGISTRY, QuerySpec, oracle_sql, queries, register

# Import for registration side effects.
from . import advanced  # noqa: F401
from . import relational  # noqa: F401
from . import tpch_deep  # noqa: F401
from . import tpch_fill  # noqa: F401
from . import scalar  # noqa: F401
from . import windows  # noqa: F401
from . import fraud  # noqa: F401
from . import quality  # noqa: F401
from . import llmprep  # noqa: F401
from . import writeside  # noqa: F401
from . import mining  # noqa: F401
from . import round7  # noqa: F401
from . import round8  # noqa: F401
from . import round9  # noqa: F401
from . import round10  # noqa: F401
from . import round11  # noqa: F401
from . import round12  # noqa: F401
from . import round13  # noqa: F401
from . import round14  # noqa: F401
from . import round15  # noqa: F401
from . import round16  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "register", "queries", "oracle_sql"]
