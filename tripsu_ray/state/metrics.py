"""Job counters: the shared-mutable-state exception done the Ray way.

The reference panics on a malformed N-Triples line
(``src/pseudo.rs:73-75``); this engine's ``on_error="skip"`` policy must
COUNT what it drops (the north rule's counted-malformed-row metric), but
map tasks run on many workers with no shared memory — the one sanctioned
piece of shared mutable state is a tiny named actor that parse tasks
fire-and-forget increments to. Reads (``counts()``) happen on the driver
after the consuming stage finishes; increments are batched per map batch,
so actor traffic is O(#batches), never O(#rows).
"""

from __future__ import annotations


def _counter_cls():
    import ray

    @ray.remote(num_cpus=0)
    class _Counter:
        def __init__(self):
            self._counts: dict[str, int] = {}

        def add(self, key: str, n: int) -> None:
            self._counts[key] = self._counts.get(key, 0) + int(n)

        def get(self) -> dict[str, int]:
            return dict(self._counts)

        def reset(self) -> None:
            self._counts.clear()

    return _Counter


class JobCounters:
    """Named, idempotently-created counter actor + driver-side helpers.

    The default name is JOB-scoped (two jobs on one cluster must not share
    or reset each other's counters) and the actor is owned by the creating
    driver — it dies with the job instead of leaking as a detached actor
    on a long-lived cluster. Workers receive the HANDLE via fn_kwargs, so
    the name only serves idempotent re-creation within one driver.
    """

    def __init__(self, name: str | None = None):
        import ray

        if name is None:
            name = f"tripsu_ray_counters_{ray.get_runtime_context().get_job_id()}"
        self.name = name
        self.actor = _counter_cls().options(name=name, get_if_exists=True).remote()

    def handle(self):
        """The actor handle — picklable, pass it into map fns via fn_kwargs."""
        return self.actor

    def counts(self) -> dict[str, int]:
        import ray

        return ray.get(self.actor.get.remote())

    def reset(self) -> None:
        import ray

        ray.get(self.actor.reset.remote())


class StageLog:
    """Structured per-stage job log (reference parity: ``src/log.rs``).

    The reference wraps its single-process loop in a progress bar and
    reports processed-message counts. Under streaming Ray execution,
    per-stage wall time and row counts are only well-defined at the
    pipeline's BARRIERS (fold consume, link-map fallback, materialize
    write) — so the distributed analogue is a driver-side log with one
    structured record per barrier, plus the :class:`JobCounters` actor
    for worker-side counts (e.g. ``malformed_lines``).

    Records are always collected in ``self.records`` (zero overhead
    beyond a perf_counter pair); live JSON-line emission to stderr is
    gated by ``enabled`` (default: the ``TRIPSU_RAY_LOG`` env var).
    """

    def __init__(self, enabled: bool | None = None, stream=None):
        import os
        import sys

        if enabled is None:
            enabled = os.environ.get("TRIPSU_RAY_LOG", "") not in ("", "0")
        self.enabled = enabled
        self.stream = stream if stream is not None else sys.stderr
        self.records: list[dict] = []

    def stage(self, name: str, **static):
        """Context manager timing one barrier; yields the record dict so the
        body can attach counts (``rec["rows"] = n``)."""
        import time
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            t0 = time.perf_counter()
            rec = {"stage": name, **static}
            try:
                yield rec
            finally:
                rec["wall_s"] = round(time.perf_counter() - t0, 3)
                self.records.append(rec)
                if self.enabled:
                    import json

                    print(json.dumps(rec), file=self.stream, flush=True)

        return _cm()
