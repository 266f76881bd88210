"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship KG pipeline at sf0.001 (smoke check).
``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset / DataFrame
  / pyarrow Table.
``oracle_sql()`` — DuckDB-equivalent SQL per query (views: region nation
  customer supplier part orders lineitem events documents embeddings).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the import location-independent: the driver may import this module
# by file path from any cwd.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: transcripts →
    mention-detect → entity-link → emit → prefix-cut → canonicalize."""
    from ntto_ray.pipelines.kg import run_kg_pipeline

    return run_kg_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ntto_ray import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from ntto_ray import registry

    return registry.oracle_sql()
