"""The flagship KG-construction pipeline (north-star, BASELINE.json).

    source_files ─ extract ─▶ triples ─┬─▶ [pass 1] type index (groupby) ──┐
                                       │                                   ▼ broadcast
                                       └─▶ [pass 2] pseudonymize (actor pool)
                                                        │
                                            entity link + canonicalize
                                             (key-partial-agg + broadcast apply)
                                                        │
                                            sort + dedup materialize → Parquet

Two-pass structure mirrors the reference (index first so pass 2 is a pure
stream — docs/tutorial.md:13-16); each arrow is a streaming Dataset
transform. The only materialization barriers are the two *small* driver-side
folds (type index, link map) — the triple stream itself is only pinned at
the optional checkpoint boundaries (Parquet directories), which is also what
makes a rerun resumable per stage.

Default rules exercise all three reference rule kinds over the code KG:
repository URIs are sensitive nodes (``of_type``), author literals are
masked everywhere (``on_predicate``), and commit hashes are masked only on
File subjects (``on_type_predicate``).
"""

from __future__ import annotations

import os

from ..sources.synth import read_source_files
from ..stages.extract import NS, extract_triples
from ..stages.index import broadcast_index, build_type_index, collect_index
from ..stages.link import link_entities
from ..stages.materialize import materialize
from ..stages.pseudo import pseudonymize

DEFAULT_RULES = {
    "nodes": {"of_type": [f"<{NS}Repository>"]},
    "objects": {
        "on_predicate": [f"<{NS}author>"],
        "on_type_predicate": {f"<{NS}File>": [f"<{NS}commitHash>"]},
    },
}

DEFAULT_SALT = "tripsu-ray-default-salt"


def kg_pipeline(
    sf_dir: str,
    *,
    rules_cfg: dict | None = None,
    salt: str = DEFAULT_SALT,
    algorithm: str = "sha256-salted",
    link: bool = True,
    sort: bool = True,
    output_path: str | None = None,
    checkpoint_dir: str | None = None,
    concurrency=4,
    batch_size: int = 65536,
):
    """Run extract → index → pseudo → link → materialize; returns the final Dataset.

    With ``checkpoint_dir``, the triple stream is pinned to Parquet after
    extraction and after pseudonymization (per-partition files → resumable;
    see state/checkpoint.py), and the multi-consumer stages (index build,
    link-map build, final pass) re-read those checkpoints instead of
    re-executing upstream stages.
    """
    import ray.data

    rules_cfg = DEFAULT_RULES if rules_cfg is None else rules_cfg

    triples = extract_triples(
        read_source_files(sf_dir), batch_size=2048, concurrency=concurrency
    )

    if checkpoint_dir:
        tri_path = os.path.join(checkpoint_dir, "triples")
        triples.write_parquet(tri_path)
        triples = ray.data.read_parquet(tri_path)

    # pass 1: type index (groupby-aggregate shuffle on subject) → broadcast
    index = collect_index(build_type_index(triples))
    index_ref = broadcast_index(index)

    # pass 2: rule engine actor pool
    pseudo = pseudonymize(
        triples,
        rules_cfg,
        index_ref,
        algorithm=algorithm,
        secret=salt,
        batch_size=batch_size,
        concurrency=concurrency,
    )

    if checkpoint_dir:
        ps_path = os.path.join(checkpoint_dir, "pseudo")
        pseudo.write_parquet(ps_path)
        pseudo = ray.data.read_parquet(ps_path)

    out = pseudo
    if link:
        out = link_entities(out, batch_size=batch_size, concurrency=concurrency)

    return materialize(out, output_path, sort=sort)
