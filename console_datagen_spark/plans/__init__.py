"""Declared query plans.

Each module registers QuerySpecs into the central registry; importing this
package loads them all. ``registry.all_queries()`` is the single source the
driver entry point (``__spark_entry__.py``) exposes.
"""

# Registry *order* is the order external harnesses sample queries in (a
# prefix-window harness certifies the first entries first); names are
# append-only but order is a presentation concern, set explicitly by the
# promote() call below. Module import order no longer encodes the window.
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
from . import layout  # noqa: F401
from . import versioning  # noqa: F401
from . import vocab  # noqa: F401
from . import curriculum  # noqa: F401
from . import rag  # noqa: F401
from . import bm25  # noqa: F401
from . import infotheory  # noqa: F401
from . import scale_extras  # noqa: F401
from . import features  # noqa: F401
from . import supervision  # noqa: F401
from . import quality_model  # noqa: F401
from . import io_formats  # noqa: F401
from .registry import QuerySpec, all_queries, get_query, promote  # noqa: F401

# Re-cert rotation: stalest driver certification first (never-green keys
# as round 0 and leads); oracle-less rows-only queries sort past the
# window. Invariants enforced by tests/test_rotation.py.


def _recert_order() -> list[str]:
    """Registry names, stalest driver certification first."""
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        try:
            with open(path) as f:
                results = json.load(f)
        except (OSError, ValueError):
            continue
        for name, res in results.items():
            if (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match") in (True, None)
            ):
                last_green[name] = rnd
    registry = all_queries()
    names = list(registry)
    return sorted(
        names,
        key=lambda n: (
            registry[n].oracle is None,  # rows-only past the window
            last_green.get(n, 0),  # stalest (or never) green first
            names.index(n),  # stable tie-break: registration order
        ),
    )


promote(_recert_order())
