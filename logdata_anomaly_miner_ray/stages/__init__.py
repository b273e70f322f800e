"""Constraint / transform stages, each a Dataset→Dataset (or
Dataset→small-table) operator built from ``map_batches`` partials,
pre-aggregated ``groupby`` shuffles and broadcast validate passes.

Stage catalogue (reference detector each recasts — SURVEY.md §2.4):

- column_stats   — ParserCount / HistogramAnalysis / value moments
- uniqueness     — north-rule uniqueness on url (salted groupby)
- referential    — MissingMatchPathValue / correlation referential
- domain         — NewMatchPathValue(Combo) first-seen value domains
- value_range    — ValueRangeDetector per-id [min,max]
- charset        — CharsetDetector per-id codepoint sets
- entropy        — EntropyDetector char-pair probability scoring
- frequency      — EventFrequencyDetector windowed count bands
- missing        — MissingMatchPathValueDetector interval gaps
- ordering       — TimestampsUnsortedDetector / monotonic adjust
- sequence       — EventSequenceDetector event n-grams
- drift          — VariableTypeDetector KS / PSI drift tests
- dedup          — exact + MinHash/SimHash/embedding near-dup
- ann            — brute-force & bucketed cosine top-k
- multimodal     — binary-payload decode plumbing (stubbed codecs)
"""
