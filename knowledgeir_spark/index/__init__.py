"""The inverted-index subsystem: posting-list codec, distributed build, query.

This is the part the reference delegated to an external engine
(Indri/Elasticsearch — /root/reference/setup.py:23, utils/base.py:210-258);
here it is built natively on Spark per the north_rule: per-partition posting
construction, salted term-hash shuffle, varint-compressed block-max shards,
lineage-tracked idempotent commits, BM25 top-k with block-max pruning.
"""
