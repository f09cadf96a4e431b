"""Pass 2 — rule-based pseudonymization as an actor-pool map_batches stage.

Reference shape: a single-threaded loop holding rules + index + key
(src/pseudo.rs:47-78). Ray shape: a callable CLASS passed to ``map_batches``
— the compiled matcher (rules × index probe sets) and the pseudonymizer key
are built ONCE per actor in ``__init__`` (the index arrives as a broadcast
ObjectRef, resolved once from the local object store); ``__call__`` applies
the vectorized mask + rewrite per Arrow batch.

Scale notes: the broadcast-dict path holds to ~10^7 typed subjects; past
that the same semantics run as two hash-partitioned semi-joins (triples ⋈
index on subject, then on object) — keep both behind this module's API.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.crypto import new_pseudonymizer
from ..functions.engine import CompiledMatcher, pseudonymize_batch
from ..functions.rules import Rules


class PseudonymizeActor:
    def __init__(self, rules_cfg: dict, index_ref, algorithm: str, secret):
        import ray

        index = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
        self.matcher = CompiledMatcher(rules, index)
        self.pseudo = new_pseudonymizer(algorithm, secret)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pseudonymize_batch(batch, self.matcher, self.pseudo)


def pseudonymize(
    triples,
    rules_cfg: dict,
    index_ref,
    *,
    algorithm: str = "sha256-salted",
    secret,
    batch_size: int = 65536,
    concurrency=4,
):
    """triples Dataset → pseudonymized triples Dataset (actor pool).

    ``concurrency`` int N becomes an autoscaling pool (1, N): the pool only
    grows when batches queue up, so it never reserves the whole cluster away
    from upstream read/extract tasks (fixed pools that sum to the CPU count
    deadlock the streaming executor's admission).
    """
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)
    return triples.map_batches(
        PseudonymizeActor,
        fn_constructor_args=(rules_cfg, index_ref, algorithm, secret),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
