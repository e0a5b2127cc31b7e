"""Engine configuration.

Mirrors the reference's ``Options`` / ``TileOptions`` defaults
(/root/reference/src/lib.rs:25-62).  Plain dataclasses; instances are
broadcast into UDF closures by the Spark operators.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TileOptions:
    tolerance: float = 3.0  # simplification tolerance (higher => simpler)
    extent: int = 4096  # tile extent
    buffer: int = 64  # tile buffer on each side
    line_metrics: bool = False  # track distance-along-line for LineStrings


@dataclass(frozen=True)
class Options:
    max_zoom: int = 18  # max zoom to preserve detail on (<= 24)
    index_max_zoom: int = 5  # max zoom in the first-pass tile index
    index_max_points: int = 100000  # max points/tile before splitting stops
    generate_id: bool = False  # replace feature ids with sequential ints
    tile: TileOptions = field(default_factory=TileOptions)
    # engine knob (no reference counterpart): a tile whose num_points is
    # at or below this renders its ENTIRE subtree inside one Spark task
    # via the core tiler instead of another per-level round-trip; results
    # are identical (same recursion), only the execution site changes
    fuse_max_points: int = 100_000

    def __post_init__(self) -> None:
        if self.max_zoom > 24:
            raise ValueError("max_zoom must be <= 24")
