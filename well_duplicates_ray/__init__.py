"""well_duplicates_ray — a from-scratch, Ray-Data-native near-duplicate
detection + clustering engine.

Re-expresses the capabilities of ``EdinburghGenomics/well_duplicates``
(a single-process Illumina well-duplicate QC tool; see SURVEY.md §0-§2 —
the local reference snapshot is empty, citations are to the upstream
public repo at file/function granularity) as an idiomatic Ray Data
pipeline over tables of image + caption pairs:

- the reference's *precomputed spatial neighborhoods* (levels/rings around
  each nanowell, ``prepare_indexed_targets.py``) become LSH band buckets and
  pHash Hamming prefix-band rings computed data-parallel per run;
- its *windowed near-identity sequence compare* (``count_well_duplicates.py``,
  ``is_dup`` over a fixed cycle window) becomes pairwise verification:
  exact content hash, caption shingle-Jaccard, pHash Hamming radius, and a
  suffix-array longest-common-substring pass;
- its *per-level counters* become grouped aggregates + a checkpoint
  manifest with per-partition lineage.

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over
zero-copy Arrow batches, with actor pools for stateful stages.
"""

from well_duplicates_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.4.0"
