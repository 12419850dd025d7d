#!/usr/bin/env python
"""Declarative fake-data generation from YAML templates — the analog of
the reference's plait.py workflow (/root/reference/scripts/plait/*.yaml:
a `fields:` map where each field is a lambda / random distribution /
choice list / sub-template reference).

    python scripts/fakedata/from_yaml.py scripts/plait/host_generator.yaml \
        10000 | python -m sybil_tpu ingest -table uptime

Supported field forms (a superset of what the shipped templates use):

    fields:
      status:  {choice: ["200", "403", "404", "500", "503"]}
      ping:    {random: "gauss(60, 20)", abs: true, int: true}
      weight:  {choice: [1, 10, 100]}
      host:    {choice_weighted: {"a.com": 5, "b.com": 1}}
      uid:     {random: "randint(0, 5000)", format: "user{}"}
      time:    {time_uniform: 2419200}        # now +/- N seconds
      tags:    {sets: [["a","b"], ["b","c"]]}
      f1:      {lambda: "random.random() * 100", int: true}

Seeded (--seed) and vectorized per batch where possible; emits JSON
lines on stdout like the other generators.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def _compile_field(name: str, spec, rng: random.Random):
    if isinstance(spec, (str, int, float)):        # constant
        return lambda: spec
    if not isinstance(spec, dict):
        raise ValueError(f"field {name}: unsupported spec {spec!r}")

    post_int = bool(spec.get("int"))
    post_abs = bool(spec.get("abs"))
    fmt = spec.get("format")

    def post(fn):
        def wrapped():
            v = fn()
            if post_abs:
                v = abs(v)
            if post_int:
                v = int(v)
            if fmt:
                v = fmt.format(v)
            return v
        return wrapped

    if "choice" in spec:
        opts = spec["choice"]
        return post(lambda: rng.choice(opts))
    if "choice_weighted" in spec:
        items = list(spec["choice_weighted"].items())
        vals = [k for k, _ in items]
        weights = [w for _, w in items]
        return post(lambda: rng.choices(vals, weights=weights, k=1)[0])
    if "random" in spec:
        expr = spec["random"]            # e.g. "gauss(60, 20)"
        fn_name, args = expr.split("(", 1)
        args = eval(f"({args}", {"__builtins__": {}})  # literal tuple
        dist = getattr(rng, fn_name.strip())
        if not isinstance(args, tuple):
            args = (args,)
        return post(lambda: dist(*args))
    if "time_uniform" in spec:
        span = int(spec["time_uniform"])
        now = int(spec.get("now", time.time()))
        return post(lambda: now + rng.randint(-span, span))
    if "sets" in spec:
        opts = spec["sets"]
        return post(lambda: rng.choice(opts))
    if "lambda" in spec:
        code = compile(spec["lambda"], f"<field {name}>", "eval")
        env = {"random": rng, "int": int, "abs": abs, "min": min,
               "max": max, "time": time}
        return post(lambda: eval(code, env))
    raise ValueError(f"field {name}: no recognized generator in {spec!r}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("template")
    p.add_argument("count", type=int, nargs="?", default=1000)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args()

    import yaml
    with open(args.template) as f:
        doc = yaml.safe_load(f)
    fields = doc.get("fields") or {}
    rng = random.Random(args.seed)
    gens = {name: _compile_field(name, spec, rng)
            for name, spec in fields.items()
            if not name.startswith("_")}

    out = sys.stdout
    for _ in range(args.count):
        out.write(json.dumps({k: g() for k, g in gens.items()}))
        out.write("\n")


if __name__ == "__main__":
    main()
