"""GCPRegions probe (reference hub/google/__init__.py:11) — offline, with an
injected deterministic prober."""

from yolo_sod_tpu.hub.google import GCPRegions


def _fake_probe_factory():
    # Deterministic per-region latencies: hash-based, us-east5 forced best.
    def probe(region: str) -> float:
        if region == "us-east5":
            return 3.0
        return 10.0 + (hash(region) % 97)
    return probe


def test_tiers_partition_regions():
    g = GCPRegions()
    t1, t2 = set(g.tier1()), set(g.tier2())
    assert t1 and t2 and not (t1 & t2)
    assert t1 | t2 == set(g.regions)


def test_tpu_region_filter():
    g = GCPRegions()
    assert "europe-west4" in g.tpu_regions("v5p")
    assert "us-east5" in g.tpu_regions("v5e")
    assert all(g.regions[r].tpu for r in g.tpu_regions())


def test_lowest_latency_ranking_and_tpu_gate():
    g = GCPRegions(probe=_fake_probe_factory())
    rows = g.lowest_latency(top=3, attempts=2, require_tpu="v5e")
    assert rows[0][0] == "us-east5"
    assert rows[0][1] == 3.0 and rows[0][2] == 0.0      # mean, std
    names = [r[0] for r in rows]
    assert set(names) <= set(g.tpu_regions("v5e"))
    # ascending means
    assert rows[0][1] <= rows[1][1] <= rows[2][1]


def test_offline_probe_degrades_to_inf():
    g = GCPRegions(probe=lambda r: float("inf"))
    rows = g.lowest_latency(top=1, tier=1)
    assert rows[0][1] == float("inf")
