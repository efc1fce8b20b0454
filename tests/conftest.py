import gzip
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXDIR = os.path.join(REPO, "tests", "fixtures")


def load_jsonl(name):
    path = os.path.join(FIXDIR, name)
    opener = gzip.open if name.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.fixture(scope="session")
def probe_cases():
    return load_jsonl("probe_cases.jsonl")


@pytest.fixture(scope="session")
def golden_sf0001():
    return load_jsonl("golden_sf0001.jsonl.gz")


@pytest.fixture(scope="session")
def spark():
    """local[*] session with the engine's tuned defaults (plans/session.py)."""
    from html_parser_spark.plans.session import get_spark

    s = get_spark(app_name="pytest", shuffle_partitions=8)
    yield s
    s.stop()
