#!/usr/bin/env python
"""Per-user profile table for join demos, mirroring the reference's
/root/reference/scripts/fakedata/activity_join_generator.py: one record
per `userid` ("personN", the activity_generator join key) with profile
string columns.  Vectorized numpy, no Faker dependency — names/places
are synthesized from seed lists.

Usage:
  python scripts/fakedata/activity_join_generator.py [N_USERS] > rows.json
"""

import json
import sys

import numpy as np

from activity_generator import USER_IDS

BROWSERS = ["firefox", "chrome", "ie", "safari"]
FIRST = ["Alex", "Sam", "Jordan", "Taylor", "Casey", "Riley", "Morgan",
         "Avery", "Quinn", "Rowan", "Jamie", "Drew"]
LAST = ["Smith", "Garcia", "Chen", "Patel", "Okafor", "Nguyen", "Silva",
        "Kim", "Haddad", "Novak", "Larsen", "Diallo"]
COMPANY = ["Initech", "Globex", "Umbrella", "Hooli", "Stark Industries",
           "Wayne Enterprises", "Wonka", "Acme", "Soylent", "Tyrell"]
CITY = ["Springfield", "Riverton", "Lakeside", "Hillview", "Marston",
        "Fairfield", "Ashford", "Brookdale", "Northgate", "Eastvale"]
STATE = ["CA", "NY", "TX", "WA", "OR", "MA", "IL", "CO", "GA", "FL"]
COUNTRY = ["US", "CA", "GB", "DE", "FR", "BR", "JP", "IN", "AU", "MX"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else USER_IDS
    rng = np.random.default_rng(99)
    fi = rng.integers(0, len(FIRST), n)
    la = rng.integers(0, len(LAST), n)
    co = rng.integers(0, len(COMPANY), n)
    ci = rng.integers(0, len(CITY), n)
    st = rng.integers(0, len(STATE), n)
    cy = rng.integers(0, len(COUNTRY), n)
    br = rng.integers(0, len(BROWSERS), n)
    mobile = rng.integers(0, 2, n)
    out = sys.stdout
    for j in range(1, n + 1):
        i = j - 1
        out.write(json.dumps({
            "name": f"{FIRST[fi[i]]} {LAST[la[i]]}",
            "userid": f"person{j}",
            "company": COMPANY[co[i]],
            "browser": BROWSERS[br[i]],
            "city": CITY[ci[i]],
            "state": STATE[st[i]],
            "country": COUNTRY[cy[i]],
            "mobile": int(mobile[i]),
        }) + "\n")


if __name__ == "__main__":
    main()
