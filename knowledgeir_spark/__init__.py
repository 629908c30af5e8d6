"""knowledgeir_spark — a PySpark-native fulltext indexing + BM25 retrieval engine.

A from-scratch re-expression of the query/data-processing capabilities of
wayne9qiu/KnowledgeIR (research IR pipeline, Python 2.7, file-based) as an
idiomatic Spark DataFrame program:

- deterministic tokenization / text cleaning (reference: knowledge4ir/utils/nlp.py)
- corpus statistics: TF, DF, avg doc length (reference: prepare/bow/prepare_corpus_stat.py)
- inverted posting lists, varint-compressed with block-max metadata (the
  reference delegated this to Indri/Elasticsearch; we build it natively)
- BM25 / LM / tf-idf scoring, rank-identical to the reference scorer
  (reference: knowledge4ir/utils/retrieval_model.py:251-266, quirks included)
- top-k ranking in TREC shape (reference: knowledge4ir/utils/base.py:118-145)
- RM3 expansion, NDCG/ERR evaluation, dedup / similarity ops for
  training-data pipelines.

Everything is DataFrame/Catalyst-first; Python appears only inside
Arrow-vectorized pandas UDFs (posting codec, WAND).
"""

__version__ = "0.1.0"
