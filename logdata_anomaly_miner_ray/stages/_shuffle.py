"""Shuffle-partition sizing shared by the wide operators.

Ray Data's sort/groupby shuffle builds an (input blocks × output
partitions) intermediate matrix, and by default the output partition
count follows the INPUT block count. For narrow exploded rows (a few
int64s per row) produced 1:1 from many small read blocks that is the
wrong shape twice over: on this box a 256×256 matrix of ~4 MB blocks
costs ~3× the wall time of a 64×64 one (measured, BASELINE.md), and
at 100 TB the input would be ~10^5 blocks — a 10^10-piece matrix.
The shuffle matrix should track CLUSTER size, not input block count:
coalescing to ~2 tasks per CPU keeps every core busy through the
reduce while bounding the matrix.
"""

from __future__ import annotations

import ray


def shuffle_parallelism(floor: int = 32) -> int:
    """2 × cluster CPUs, at least ``floor`` — the partition count to
    ``repartition`` narrow rows to before a groupby/sort."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 16
    except Exception:  # pragma: no cover - no cluster yet
        cpus = 16
    return max(floor, 2 * cpus)
