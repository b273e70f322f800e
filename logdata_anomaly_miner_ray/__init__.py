"""Ray-Data-native schema + constraint validation engine.

A from-scratch re-expression of the query / data-processing
capabilities of the AMiner log-anomaly pipeline
(ait-aecid/logdata-anomaly-miner, studied read-only at
/root/reference) as declarative column-stat, domain, uniqueness,
referential, frequency, ordering and distribution-drift constraints
over Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.

Architecture (idiomatic Ray Data, NOT a port):

- every per-record transform is a vectorized ``map_batches`` over
  zero-copy Arrow batches (``batch_format="pyarrow"``);
- learned detector state (AMiner's persistence JSON) becomes
  mergeable per-block partial states reduced to a single broadcast
  constraint-state object (``ray.put`` once, read in every task);
- keyed checks (uniqueness on url, referential url->warc_ts,
  per-key ranges, frequency windows) are hash-partitioned
  ``groupby`` shuffles with pre-aggregation inside ``map_batches``;
- order-dependent checks (sequences, transition times, unsorted
  timestamps) sort within key groups, never globally;
- sketches (HyperLogLog, t-digest) replace AMiner's exact in-memory
  sets where 10^12-row scale demands it, with an exact mode kept for
  small-scale oracle tests.
"""

__version__ = "0.1.0"
