"""LLM-training-data pipeline operators (north-star extensions).

Not present in the reference — these are the ops a 100 TB text/embedding
corpus pipeline needs, built on the same Spark-first discipline as the
relational core: built-in columnar expressions wherever possible, Arrow
Pandas UDFs only where vector math genuinely needs numpy, never
row-at-a-time Python.

- ``dedup``       exact + MinHash-LSH + SimHash + n-gram-Jaccard near-dup
- ``bloom``       broadcast-Bloom n-gram decontamination (corpus never
                  shuffles; eval-set bitmap broadcast + Arrow gather)
- ``simsearch``   embedding cosine top-k: brute force + LSH-bucketed + IVF
- ``textops``     tokenization, language-ID, quality scores, fingerprints
- ``tokenize``    real BPE: distributed train (vocab-sized merge rounds)
                  + frozen-merge-table encode (distinct-word Zipf cache)
- ``filtering``   corpus quality-gate cascade + fixed-size token chunking
- ``curation``    the composed end-to-end ladder: gate → exact dedup →
                  near-dup components → domain cap → split → decontaminate
- ``multimodal``  opaque binary columns with typed metadata + stubbed decode
"""
