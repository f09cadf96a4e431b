"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in tripsu_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline on sf0.001: synth source_files → extract →
    type-index → pseudonymize → link → sorted dedup materialize."""
    from tripsu_ray.pipelines.kg import kg_pipeline

    return kg_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from tripsu_ray.pipelines import queries as q

    return {
        "kg_source_files": q.q_source_files,
        "kg_extract": q.q_extract,
        "kg_type_index": q.q_type_index,
        "kg_pseudo": q.q_pseudo,
        "kg_link_map": q.q_link_map,
        "kg_pipeline": q.q_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    from tripsu_ray.pipelines import oracle

    return {
        "kg_source_files": oracle.sql_source_files(),
        "kg_extract": oracle.sql_extract(),
        "kg_type_index": oracle.sql_type_index(),
        "kg_pseudo": oracle.sql_pseudo(),
        "kg_link_map": oracle.sql_link_map(),
        "kg_pipeline": oracle.sql_pipeline(),
    }
