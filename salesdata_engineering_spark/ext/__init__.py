"""Engine extensions beyond the reference surface (SURVEY §2.11, X1-X4,
plus the training-data-pipeline operators from the north star):

- :mod:`.hashing`  — deterministic cross-engine 64-bit hashing (md5-based)
- :mod:`.text`     — tokenization, language-ID, quality scoring, fingerprints
- :mod:`.dedup`    — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- :mod:`.similarity` — brute-force + LSH-bucketed cosine top-k search

The reference has none of these (its surface ends at the two sales marts);
they are the operators a 100 TB LLM-training-data pipeline runs on the
``documents`` / ``embeddings`` / ``events`` tables.
"""
