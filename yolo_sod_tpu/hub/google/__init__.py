"""GCP region probe — latency-ranked region picker with TPU metadata.

Capability parity with reference hub/google/__init__.py:11 (GCPRegions:
tiered region table, threaded HEAD-request pings, `lowest_latency(top,
verbose, tier, attempts)` ranking). TPU-native additions: each region row
carries the Cloud-TPU generations offered there, and `tpu_regions()` /
`lowest_latency(require_tpu=...)` filter to regions where a v5e/v5p pod can
actually be provisioned — the question this framework's users ask.

Zero-egress safe: the prober is injectable (`probe=` callable); the default
uses `requests` when available and degrades every region to +inf latency
otherwise instead of raising, so the ranking API stays usable offline.
"""

from __future__ import annotations

import statistics
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple


@dataclass(frozen=True)
class RegionInfo:
    """Static facts about one GCP region."""

    tier: int
    city: str
    country: str
    tpu: Tuple[str, ...] = field(default_factory=tuple)  # TPU generations offered


# Tier = the reference's network-tier classification; tpu = Cloud TPU
# availability by generation (docs: cloud.google.com/tpu/docs/regions-zones).
_REGIONS = {
    "asia-east1": RegionInfo(1, "Taiwan", "China"),
    "asia-east2": RegionInfo(2, "Hong Kong", "China"),
    "asia-northeast1": RegionInfo(1, "Tokyo", "Japan", ("v5e",)),
    "asia-northeast2": RegionInfo(1, "Osaka", "Japan"),
    "asia-northeast3": RegionInfo(2, "Seoul", "South Korea"),
    "asia-south1": RegionInfo(2, "Mumbai", "India"),
    "asia-south2": RegionInfo(2, "Delhi", "India"),
    "asia-southeast1": RegionInfo(2, "Jurong West", "Singapore", ("v4",)),
    "asia-southeast2": RegionInfo(2, "Jakarta", "Indonesia"),
    "australia-southeast1": RegionInfo(2, "Sydney", "Australia"),
    "australia-southeast2": RegionInfo(2, "Melbourne", "Australia"),
    "europe-central2": RegionInfo(2, "Warsaw", "Poland"),
    "europe-north1": RegionInfo(1, "Hamina", "Finland"),
    "europe-southwest1": RegionInfo(1, "Madrid", "Spain"),
    "europe-west1": RegionInfo(1, "St. Ghislain", "Belgium"),
    "europe-west2": RegionInfo(2, "London", "United Kingdom"),
    "europe-west3": RegionInfo(2, "Frankfurt", "Germany"),
    "europe-west4": RegionInfo(1, "Eemshaven", "Netherlands", ("v5e", "v5p", "v2")),
    "europe-west6": RegionInfo(2, "Zurich", "Switzerland"),
    "europe-west8": RegionInfo(1, "Milan", "Italy"),
    "europe-west9": RegionInfo(1, "Paris", "France"),
    "europe-west10": RegionInfo(2, "Berlin", "Germany"),
    "europe-west12": RegionInfo(2, "Turin", "Italy"),
    "me-central1": RegionInfo(2, "Doha", "Qatar"),
    "me-west1": RegionInfo(1, "Tel Aviv", "Israel"),
    "northamerica-northeast1": RegionInfo(2, "Montreal", "Canada"),
    "northamerica-northeast2": RegionInfo(2, "Toronto", "Canada"),
    "southamerica-east1": RegionInfo(2, "São Paulo", "Brazil"),
    "southamerica-west1": RegionInfo(2, "Santiago", "Chile"),
    "us-central1": RegionInfo(1, "Iowa", "United States", ("v5e", "v2")),
    "us-east1": RegionInfo(1, "South Carolina", "United States", ("v5e", "v3")),
    "us-east4": RegionInfo(1, "Northern Virginia", "United States"),
    "us-east5": RegionInfo(1, "Columbus", "United States", ("v5e", "v5p")),
    "us-south1": RegionInfo(1, "Dallas", "United States", ("v5e",)),
    "us-west1": RegionInfo(1, "Oregon", "United States"),
    "us-west2": RegionInfo(2, "Los Angeles", "United States"),
    "us-west3": RegionInfo(2, "Salt Lake City", "United States"),
    "us-west4": RegionInfo(2, "Las Vegas", "United States", ("v5e",)),
}

# Stats row: (region, mean_ms, std_ms, min_ms, max_ms) — reference layout.
LatencyRow = Tuple[str, float, float, float, float]


def _default_probe(region: str, timeout: float = 5.0) -> float:
    """One round-trip-time sample in ms against the region's artifact
    registry endpoint (the reference's probe target), +inf on any failure
    (including a zero-egress environment with no `requests`)."""
    try:
        import requests
    except ImportError:
        return float("inf")
    t0 = time.time()
    try:
        requests.head(f"https://{region}-docker.pkg.dev", timeout=timeout)
    except Exception:
        return float("inf")
    return (time.time() - t0) * 1000.0


class GCPRegions:
    """Latency-ranked GCP region picker (reference hub/google:11).

    Args:
        probe: optional `region -> latency_ms` callable replacing the HTTP
            prober (offline tests inject a deterministic one).
    """

    def __init__(self, probe: Optional[Callable[[str], float]] = None):
        self.regions = dict(_REGIONS)
        self._probe = probe or _default_probe

    # -- static classification ------------------------------------------------
    def tier1(self) -> List[str]:
        return [r for r, info in self.regions.items() if info.tier == 1]

    def tier2(self) -> List[str]:
        return [r for r, info in self.regions.items() if info.tier == 2]

    def tpu_regions(self, generation: Optional[str] = None) -> List[str]:
        """Regions offering Cloud TPU — optionally a specific generation
        ('v5e', 'v5p', ...). TPU-native extension over the reference."""
        return [r for r, info in self.regions.items()
                if info.tpu and (generation is None or generation in info.tpu)]

    # -- probing ---------------------------------------------------------------
    def _sample(self, region: str, attempts: int) -> LatencyRow:
        vals = [v for v in (self._probe(region) for _ in range(attempts))
                if v != float("inf")]
        if not vals:
            return (region, *(float("inf"),) * 4)
        std = statistics.stdev(vals) if len(vals) > 1 else 0.0
        return region, statistics.mean(vals), std, min(vals), max(vals)

    def lowest_latency(self, top: int = 1, verbose: bool = False,
                       tier: Optional[int] = None, attempts: int = 1,
                       require_tpu: Optional[str | bool] = None
                       ) -> List[LatencyRow]:
        """Rank regions by mean probe latency (reference :104-155).

        Args:
            top: number of best regions to return.
            verbose: print the full ranked table.
            tier: restrict to a network tier (1 or 2).
            attempts: probe samples per region.
            require_tpu: True → only TPU regions; a string ('v5p') → only
                regions offering that generation.
        """
        names = list(self.regions)
        if tier:
            names = [r for r in names if self.regions[r].tier == tier]
        if require_tpu:
            gen = require_tpu if isinstance(require_tpu, str) else None
            allowed = set(self.tpu_regions(gen))
            names = [r for r in names if r in allowed]
        with ThreadPoolExecutor(max_workers=min(50, max(1, len(names)))) as ex:
            rows = list(ex.map(lambda r: self._sample(r, attempts), names))
        rows.sort(key=lambda row: row[1])
        if verbose:
            for region, mean, std, lo, hi in rows:
                info = self.regions[region]
                where = f"{info.city}, {info.country}"
                lat = "timeout" if mean == float("inf") else \
                    f"{mean:.0f} ± {std:.0f} ms ({lo:.0f}-{hi:.0f})"
                tpus = ",".join(info.tpu) or "-"
                print(f"{region:<25} {where:<32} tier{info.tier} "
                      f"tpu[{tpus:<12}] {lat}")
        return rows[:top]


__all__ = ["GCPRegions", "RegionInfo"]
