"""Vectorized scalar-function kernels used inside ``map_batches``.

AMiner has no scalar-function library — inline byte-at-a-time Python
everywhere (SURVEY.md §2.8). Here every kernel operates on the flat
utf-8 buffer of an Arrow string column (zero-copy via
``Array.buffers()``) with numpy, so the per-batch cost is a handful
of C-speed passes regardless of row count.
"""
