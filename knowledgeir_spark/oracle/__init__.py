"""Pure-Python oracle: the rank-identity judge for the Spark engine.

Faithful port of the reference's scoring semantics (quirks preserved) plus
dict-based corpus statistics / posting lists. No Spark imports here — this
package must stay importable and runnable standalone so tests can compare
engine output against it.
"""
