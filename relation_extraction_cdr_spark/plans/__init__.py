"""End-to-end logical plans: the triple factory and its metrics."""
