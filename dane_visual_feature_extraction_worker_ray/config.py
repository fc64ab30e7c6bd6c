"""Typed pipeline configuration.

Reference analog: the yacs layered config + 100-line validator
(``/root/reference/base_util.py:10-131``). Here: a plain frozen
dataclass validated at construction, shipped to workers by value (it is
tiny and picklable) — never re-read per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

US_PER_S = 1_000_000


@dataclass(frozen=True)
class FeatureConfig:
    """Knobs of the flagship transcript feature pipeline.

    All window/gap parameters are in integer microseconds so every
    comparison is exact (no float timestamps anywhere — mirrors the
    reference's integer-ms timestamps, ``data_handling.py:74-84``).
    """

    # gap-based sessionization threshold (reference analog: interval
    # membership in shot table, data_handling.py:121-129)
    session_gap_us: int = 4 * 3600 * US_PER_S
    # sliding row-window width (turns), ROWS BETWEEN w-1 PRECEDING AND CURRENT
    row_window: int = 5
    # sliding time-window width: [ts - time_window_us, ts] inclusive
    time_window_us: int = 24 * 3600 * US_PER_S
    # tumbling window width for per-bucket aggregates
    tumble_us: int = 3600 * US_PER_S
    # as-of join: latest snapshot with snap.ts <= turn.ts when True,
    # strictly snap.ts < turn.ts when False (zero-leakage either way)
    asof_allow_exact: bool = True
    # scorer output vector width (reference: 512-d VisualNet,
    # nn_models.py:63; kept small here)
    feature_dim: int = 16
    scorer_seed: int = 42

    def __post_init__(self) -> None:
        if self.session_gap_us <= 0:
            raise ValueError("session_gap_us must be positive")
        if self.row_window < 1:
            raise ValueError("row_window must be >= 1")
        if self.time_window_us <= 0 or self.tumble_us <= 0:
            raise ValueError("windows must be positive")
        if self.feature_dim < 4:
            raise ValueError("feature_dim must be >= 4")


@dataclass(frozen=True)
class PartitionConfig:
    """How the one wide shuffle is laid out.

    ``num_buckets`` is the unit of parallelism, memory, and resume: one
    hash bucket of conversations = one sorted Arrow batch = one output
    partition = one lineage record. At 100 TB you raise ``num_buckets``
    (so a bucket stays ~0.5-1 GiB), not the kernel code.
    """

    num_buckets: int = 64
    # conversations with more rows than this are salted into chunks
    # (skew handling; see stages/salting.py)
    salt_threshold: int = 250_000
    salt_chunk: int = 100_000
    # True → explicit two-stage hash exchange (stages/exchange.py,
    # measured 5-20x faster than the sort-based groupby shuffle);
    # False → Dataset-native groupby().map_groups fallback
    use_core_exchange: bool = True

    def __post_init__(self) -> None:
        if self.num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        if self.salt_chunk < 2 or self.salt_threshold < self.salt_chunk:
            raise ValueError("salt_threshold must be >= salt_chunk >= 2")


@dataclass(frozen=True)
class PipelineConfig:
    features: FeatureConfig = field(default_factory=FeatureConfig)
    partitioning: PartitionConfig = field(default_factory=PartitionConfig)


# ---------------------------------------------------------------------------
# layered file loading (reference analog: yacs base config overlaid by
# ~/.DANE/config.yml + the assertion validator, base_util.py:10-131)

_SECTIONS = {"features": FeatureConfig, "partitioning": PartitionConfig}


def _merge_layers(layers: list[dict]) -> dict[str, dict]:
    merged: dict[str, dict] = {k: {} for k in _SECTIONS}
    for i, layer in enumerate(layers):
        if not isinstance(layer, dict):
            raise ValueError(f"config layer {i} is not a mapping")
        unknown = set(layer) - set(_SECTIONS)
        if unknown:
            raise ValueError(
                f"unknown config section(s) {sorted(unknown)}; "
                f"expected {sorted(_SECTIONS)}"
            )
        for section, vals in layer.items():
            if vals is None:
                continue
            if not isinstance(vals, dict):
                raise ValueError(f"section '{section}' is not a mapping")
            cls = _SECTIONS[section]
            bad = set(vals) - set(cls.__dataclass_fields__)
            if bad:
                raise ValueError(
                    f"unknown key(s) {sorted(bad)} in section "
                    f"'{section}'; valid: "
                    f"{sorted(cls.__dataclass_fields__)}"
                )
            merged[section].update(vals)  # later layer wins per key
    return merged


def load_config(*sources, **overrides) -> PipelineConfig:
    """Layered config: each source is a YAML file path or a dict, merged
    left→right (later layers win per key); ``overrides`` are applied
    last as ``section__key=value`` kwargs (e.g. ``features__row_window=7``).
    Unknown sections/keys fail fast at the driver, and the frozen
    dataclasses re-validate values on construction — the engine analog
    of the reference's layered yacs config + 100-line validator
    (``base_util.py:10-16,21-131``). The result is shipped to workers
    by value; nothing re-reads files per task."""
    layers: list[dict] = []
    for src in sources:
        if isinstance(src, dict):
            layers.append(src)
        else:
            import yaml

            with open(src) as f:
                layers.append(yaml.safe_load(f) or {})
    ov: dict[str, dict] = {}
    for k, v in overrides.items():
        section, _, key = k.partition("__")
        if not key:
            raise ValueError(
                f"override '{k}' must be section__key (e.g. "
                "features__row_window)"
            )
        ov.setdefault(section, {})[key] = v
    if ov:
        layers.append(ov)
    merged = _merge_layers(layers)
    return PipelineConfig(
        features=FeatureConfig(**merged["features"]),
        partitioning=PartitionConfig(**merged["partitioning"]),
    )
