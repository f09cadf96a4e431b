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
    """Named, idempotently-created counter actor + driver-side helpers."""

    def __init__(self, name: str = "tripsu_ray_counters"):
        self.name = name
        self.actor = _counter_cls().options(
            name=name, get_if_exists=True, lifetime="detached"
        ).remote()

    def handle(self):
        """The actor handle — picklable, pass it into map fns via fn_kwargs."""
        return self.actor

    def counts(self) -> dict[str, int]:
        import ray

        return ray.get(self.actor.get.remote())

    def reset(self) -> None:
        import ray

        ray.get(self.actor.reset.remote())
