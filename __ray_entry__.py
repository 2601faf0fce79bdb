"""Driver contract for the Ray-Data validation engine.

``entry()`` runs the flagship transcript-validation pipeline at sf0.001
(plus the generic-table rule suite over the sf0.001 events table) and
returns the combined violation rows. ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 for the side-by-side DuckDB
comparison at sf=0.01.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    import pandas as pd

    from bio_data_validation_ray.pipelines import queries as q

    sf_dir = "/root/testdata/sf0.001"
    _, vio = q.run_validation(sf_dir)  # flagship transcript pipeline
    ev = q.events_validate(sf_dir)     # generic-table rule suite on testdata
    ev = ev.rename(columns={"event_id": "row_key"})
    ev["row_key"] = ev["row_key"].astype(str)
    tv = pd.DataFrame(
        {
            "row_key": vio["conv_id"].astype(str) + ":" + vio["turn_idx"].astype(str),
            "rule_id": vio["rule_id"],
            "severity": vio["severity"],
        }
    )
    return pd.concat([tv, ev], ignore_index=True)[["row_key", "rule_id", "severity"]]


def queries() -> dict[str, Callable[[str], Any]]:
    from bio_data_validation_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bio_data_validation_ray.pipelines.queries import oracles

    return oracles()
