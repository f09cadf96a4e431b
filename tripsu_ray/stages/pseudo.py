"""Pass 2 — rule-based pseudonymization as an actor-pool map_batches stage.

Reference shape: a single-threaded loop holding rules + index + key
(src/pseudo.rs:47-78). Ray shape: the (rules × index) probe sets are
compiled ONCE on the driver (vectorized — see CompiledMatcher), ``ray.put``
into the object store, and every pool actor resolves the ObjectRef once in
``__init__``; ``__call__`` applies the vectorized mask + rewrite per Arrow
batch.

Scale notes: the broadcast matcher holds to ~10^7 sensitive/otp entries;
past that the same semantics run as two hash-partitioned semi-joins
(triples ⋈ sensitive-set on subject, then on object) — same rule
semantics, different physical plan.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.crypto import new_pseudonymizer
from ..functions.engine import CompiledMatcher, pseudonymize_batch
from ..functions.rules import Rules


def compile_matcher(rules_cfg, index) -> CompiledMatcher:
    """Driver-side compile: rules (dict|Rules) × index (DataFrame|dict)."""
    rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
    return CompiledMatcher(rules, index)


def broadcast_matcher(matcher: CompiledMatcher):
    import ray

    return ray.put(matcher)


_STATE_CACHE: dict = {}


def pseudonymize_tasks(
    triples,
    matcher_ref,
    *,
    algorithm: str = "sha256-salted",
    secret,
    batch_size=None,
):
    """Task-pool variant of :func:`pseudonymize` (same semantics).

    The broadcast matcher is fetched from the local object store once per
    worker PROCESS (module-level cache keyed by ObjectRef) instead of once
    per actor. Why both exist: consecutive task-pool ``map_batches`` stages
    FUSE into a single Ray task chain (read → pseudo → canon → dedup in one
    pass through the object store), while actor-pool operators are fusion
    barriers — every hop re-materializes the stream in plasma. On a single
    node the extra hops are pure overhead; the actor-pool form remains for
    stages whose state is too big/expensive to cache per process.
    """
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        key = ("matcher", matcher_ref.hex() if hasattr(matcher_ref, "hex") else id(matcher_ref))
        matcher = _STATE_CACHE.get(key)
        if matcher is None:
            matcher = (
                ray.get(matcher_ref)
                if not isinstance(matcher_ref, CompiledMatcher)
                else matcher_ref
            )
            _STATE_CACHE[key] = matcher
        pkey = ("pseudo", algorithm, secret if isinstance(secret, (str, bytes)) else id(secret))
        pseudo = _STATE_CACHE.get(pkey)
        if pseudo is None:
            pseudo = new_pseudonymizer(algorithm, secret)
            _STATE_CACHE[pkey] = pseudo
        return pseudonymize_batch(batch, matcher, pseudo)

    return triples.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class PseudonymizeActor:
    def __init__(self, matcher_ref, algorithm: str, secret):
        import ray

        self.matcher = (
            ray.get(matcher_ref)
            if not isinstance(matcher_ref, CompiledMatcher)
            else matcher_ref
        )
        self.pseudo = new_pseudonymizer(algorithm, secret)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pseudonymize_batch(batch, self.matcher, self.pseudo)


def pseudonymize(
    triples,
    matcher_ref,
    *,
    algorithm: str = "sha256-salted",
    secret,
    batch_size: int = 16384,
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
        fn_constructor_args=(matcher_ref, algorithm, secret),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
