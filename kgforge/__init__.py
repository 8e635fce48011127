"""kgforge — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of luigiba/OpenKEonSpark.

Pipeline: transcripts → turn reassembly (B1) → mention detection +
triple extraction (B2/B3) → entity linking via translational-distance
kernels TransE/H/R/D (B4–B6, A7–A10) → MinHash-LSH + connected-components
canonicalization (B7/B8) → dense-ID materialization with lineage and
checkpoint/resume (B9–B11) → OpenKE link-prediction evaluation gate
(A15–A19).

Everything is DataFrame-first: Catalyst plans, broadcast joins for
dictionaries, AQE for skew, Arrow-batched pandas UDFs for the vectorized
NumPy hot paths. No RDDs, no per-row Python UDFs.

Reference parity notes cite OpenKEonSpark symbols (e.g.
``base/Reader.h::importTrainFiles``) per SURVEY.md §0 — the checkout at
/root/reference is empty, so citations are recalled-public-repo symbols,
not file:line.
"""

__version__ = "0.1.0"
