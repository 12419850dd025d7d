#!/usr/bin/env python
"""Client-API demo, the analog of the reference's api demo program
(/root/reference/src/api/demo/main.go): add records through the fluent
client, flush, list tables, and run a grouped loghist query.

Usage:  python scripts/api_demo.py [dbdir]
"""

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("JAX_PLATFORMS"):
    # the ambient axon TPU plugin overrides JAX_PLATFORMS at import
    # time; honor the env var before any backend init
    try:
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001
        pass

from sybil_tpu.api import SybilConfig, SybilTable  # noqa: E402

NAMES = ["jackie", "vijay", "kim", "ana", "tomo", "lee"]


def gen_records(n):
    rng = random.Random(0)
    return [{"name": rng.choice(NAMES),
             "age": rng.randint(10, 50),
             "siblings": rng.randint(0, 5)} for _ in range(n)]


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "testdb"
    config = SybilConfig(dir=d, table="test_structs")
    table = SybilTable(config)

    table.add_records(gen_records(500))
    table.flush_records()

    print("TABLES", table.list_tables())

    queried = (table.query()
               .group_by("name")
               .aggregate("age")
               .log_hist()
               .limit(1)
               .execute())
    print("QUERIED", queried)


if __name__ == "__main__":
    main()
