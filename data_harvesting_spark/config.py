"""Engine configuration.

Replaces the reference's env-var bag (``utils/VariableClass.py:10-96``) and
per-project YAML with one typed dataclass. Notable divergences from the
reference, on purpose:

- ``REMOVE_AFTER_PROCESSED`` is parsed *inverted* in the reference
  (``utils/VariableClass.py:46`` tests ``== "False"``); we do not reproduce
  that config bug — source commit is handled by streaming checkpoints.
- The reference's emission cap / suppression counters
  (``services/harvest_service.py:175,228``) become explicit, documented
  fields here.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class HarvestConfig:
    """Knobs for the harvest-and-curate pipeline.

    Defaults mirror the reference's production .env
    (MAX_NUMBER_OF_PREDICTIONS=100, FRAMES_SKIP_AFTER_DETECT=50,
    CLASSIFICATION_FPS sampling → ``sample_stride``).
    """

    # P9 — per-conversation emission cap (reference: MAX_NUMBER_OF_PREDICTIONS)
    max_pairs_per_conv: int = 100
    # P10 — post-emission suppression window, in turns
    # (reference: FRAMES_SKIP_AFTER_DETECT)
    suppress_turns_after_emit: int = 0
    # P1 — rate sampling stride (reference: fps / CLASSIFICATION_FPS);
    # 1 = keep every turn
    sample_stride: int = 1
    # P8 — min surviving turns for a conversation to emit anything
    # (reference: MIN_DETECTIONS)
    min_pairs_per_conv: int = 1
    # W1/W2 — session window gap + event-time watermark delay
    session_gap: str = "30 minutes"
    watermark_delay: str = "10 minutes"
    # roles considered call/response sides of the correlation (J3)
    call_role: str = "assistant"
    response_role: str = "tool"
    # allowed roles (P2 class allow-list analog); empty = all
    allowed_roles: tuple[str, ...] = ()
    # skew handling (M5): number of salt buckets for hot conv_ids; 0 = off
    salt_buckets: int = 0
    # sink
    sink_path: str = ""
    checkpoint_dir: str = ""
    sink_format: str = "parquet-merge"  # or "iceberg" when jars present

    # streaming state
    state_timeout: str = "EventTimeTimeout"

    extra: dict = field(default_factory=dict, hash=False, compare=False)


class ConfigError(ValueError):
    """Raised when a pipeline is built from an inconsistent config."""


def validate_config(cfg: HarvestConfig) -> HarvestConfig:
    """J4 — registration-integrity analog: the reference asserts each
    registered module's name matches the env config before running
    (`/root/reference/services/harvest_service.py:63-82`); here the build
    step asserts the config is self-consistent before a plan is built.
    """
    from data_harvesting_spark.streaming.sink import SINKS

    if cfg.max_pairs_per_conv < 0:
        raise ConfigError("max_pairs_per_conv must be >= 0 (0 = uncapped)")
    if cfg.sample_stride < 1:
        raise ConfigError("sample_stride must be >= 1")
    if cfg.call_role == cfg.response_role:
        raise ConfigError("call_role and response_role must differ")
    if cfg.allowed_roles and not (
        {cfg.call_role, cfg.response_role} <= set(cfg.allowed_roles)
    ):
        raise ConfigError(
            "allowed_roles excludes the correlation roles: nothing could emit"
        )
    if cfg.sink_format and cfg.sink_format not in SINKS:
        raise ConfigError(
            f"unknown sink_format {cfg.sink_format!r}; registered: {sorted(SINKS)}"
        )
    return cfg
