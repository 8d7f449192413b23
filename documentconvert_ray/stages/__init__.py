"""Ray Data stages: map_batches callables (stateless fns + actor classes)."""
