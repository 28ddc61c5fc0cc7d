"""LLM training-data pipeline operators: dedup (exact, MinHash-LSH,
SimHash), similarity search, and text analysis — all designed as
pure DataFrame transforms (no driver-side collection) for 100 TB.
"""
