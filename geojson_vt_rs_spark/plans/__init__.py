"""High-level engine plans: tile index, one-shot tile, spatial joins."""
