"""Constraint / transform stages, each a Dataset→Dataset (or
Dataset→small-table) operator built from ``map_batches`` partials,
pre-aggregated ``groupby`` shuffles and broadcast validate passes.

Stage catalogue (reference detector each recasts — SURVEY.md §2/§8):

- column_stats   — ParserCount / HistogramAnalysis / value moments
- uniqueness     — north-rule uniqueness on url (hashed sort shuffle)
- referential    — MissingMatchPathValue / anti-join integrity
- domain         — NewMatchPathValue(Combo) first-seen value domains
- value_range    — ValueRangeDetector per-id [min,max]
- charset        — CharsetDetector per-id codepoint bitmaps
- entropy        — EntropyDetector char-pair probability scoring
- frequency      — EventFrequencyDetector windowed count bands
- missing        — MissingMatchPathValueDetector interval gaps
- ordering       — TimestampsUnsortedDetector / monotonic adjust
- sequence       — EventSequenceDetector n-grams, transition times
- session        — NewMatchIdValueComboDetector sessionization
- correlation    — TimeCorrelationViolation / EventCorrelation /
                   VariableCorrelation / EventCountCluster recasts
- timeseries     — MatchValueAverageChange / TSA-AR / PCA /
                   PathValueTimeInterval recasts
- vartype        — VariableTypeDetector type inference
- drift          — VariableTypeDetector KS / PSI drift tests
- sampling       — EventTypeDetector ring buffers / History backoff
                   as deterministic bottom-k reservoirs
- join           — hash-partitioned and broadcast joins
- sinks          — CSV projection, violation scoring, text renderer
- dedup          — exact + MinHash/SimHash/embedding near-dup
- ann            — brute-force & IVF cosine top-k
- text_analysis  — token stats, quality, langid, fingerprints
- multimodal     — binary-payload decode plumbing (stubbed codecs)
"""
