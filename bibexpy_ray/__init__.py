"""bibexpy_ray — a Ray-Data-native data-processing / near-duplicate-detection engine.

A from-scratch reimplementation of the query and data-processing capabilities of
bcankara/BibexPy (reference, read-only at /root/reference) re-expressed Ray-Data-first:
``ray.data.Dataset`` pipelines of zero-copy Arrow ``map_batches`` stages, actor pools
for stateful signature computation, salted ``groupby`` shuffles for LSH bucketing, and
distributed connected components for cluster assignment.

The flagship pipeline (``bibexpy_ray.pipelines.dedup_images``) is a near-duplicate
detection + clustering engine (MinHash / SimHash / containment) over tables of
image + caption pairs with schema
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string, caption:string,
phash:int64)`` whose staged match semantics mirror the reference's Smart Merge core
(/root/reference/apps/api/services/smart_merger.py).

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are owned by
the caller (driver, bench.py, or the pytest fixture).
"""

from bibexpy_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
