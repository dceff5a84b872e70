"""Engine operators.

cleaning      bronze→staging clean/cast (P1-P6)
incremental   high-watermark incremental materialization (P8/ST5)
dedup         exact / MinHash-LSH / SimHash / n-gram-Jaccard deduplication
similarity    embedding similarity search (brute-force + LSH ANN)
text          text analysis (tokens, quality, language-ID, fingerprints)
asof          as-of join (trade × quote style)
multimodal    binary-column plumbing for image/audio payloads (decode stubbed)
"""
