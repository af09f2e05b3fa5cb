"""Training-data-pipeline operators: dedup, similarity, text stats, multimodal.

These extend the KG engine with the operations a 100 TB pretraining-data
pipeline needs over the ``documents``/``embeddings`` tables: exact and
near-duplicate detection, ANN similarity search, language/quality/token
analysis, and binary-column (image/audio) plumbing.
"""
