"""sybil_tpu: a TPU-native columnar analytics engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
logv/sybil append-only schema-less columnar datastore: JSON ingestion into
a row-store WAL, digestion into per-column-compressed 64Ki-record blocks,
and vectorized full-table scan queries (filters, hash group-by aggregates,
histograms/percentiles, count-distinct, time rollups, top-k) executed as
device kernels over HBM-resident columnar arrays, scaling over device
meshes with sharded scans and collective merges.
"""

from .config import Flags
from .constants import VERSION
from .table import Table, list_tables

__version__ = VERSION
__all__ = ["Flags", "Table", "list_tables", "VERSION"]
