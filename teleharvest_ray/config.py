"""Validation configuration.

The reference externalizes every behavioural threshold through env settings
(``settings.py:8-21``): min_len=200, min_views=50, min_er=0.025, min_score=80,
min_score_alt=85, a comma-split stop-word list (``settings.py:17-21``) and
channel list. We keep the same knobs (same defaults) as a plain dataclass,
plus the target-only knobs the north_rule adds (salt buckets, drift
thresholds, sketch precision).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Default stop-word patterns: substring regexes, like the reference's
# (settings.py:17-21; prefix matching asserted by tests/test_settings.py:71-77,
# e.g. "эзотери" must match "эзотерика").
DEFAULT_STOP_WORDS = ("астролог", "эзотери", "таро", "гадан")


@dataclass(frozen=True)
class ValidationConfig:
    # --- reference thresholds (settings.py:11-17) ---
    min_len: int = 200  # PROCESSOR_MIN_LEN, settings.py:13
    min_views: int = 50  # PROCESSOR_MIN_VIEWS, settings.py:14
    min_er: float = 0.025  # PROCESSOR_MIN_ER, settings.py:12
    min_score: float = 80.0  # PROCESSOR_MIN_SCORE, settings.py:15
    min_score_alt: float = 85.0  # PROCESSOR_MIN_SCORE_ALT, settings.py:16
    stop_words: tuple[str, ...] = DEFAULT_STOP_WORDS
    # Credits gate analog (processor.py:32-35,121-122): when False, the
    # scoring sub-chain (low_score / low_score_alt and their derived columns)
    # is skipped entirely and rows pass with those columns null.
    scoring_enabled: bool = True

    # --- target-only knobs (north_rule) ---
    # Salt buckets for the uniqueness hash-shuffle (hot-conversation defuse).
    salt_buckets: int = 64
    # Drift thresholds on the *statistics* (not p-values; scipy-free).
    drift_chi2_threshold: float = 0.2  # normalized chi-square / n
    drift_ks_threshold: float = 0.15  # KS ECDF max distance
    drift_quantile_rel_threshold: float = 0.5  # relative quantile delta
    # Sketch precision.
    hll_p: int = 14  # 2^14 registers, ~0.8% rel. error
    kll_k: int = 200
    # Length-histogram bin width (chars); exact & mergeable for KS.
    len_hist_bin: int = 32
    len_hist_max: int = 8192

    # --- execution knobs ---
    batch_size: int = 16384
    # Files per resumable wave (checkpoint granularity vs pipeline depth).
    wave_files: int = 64

    def stop_words_csv(self) -> str:
        return ",".join(self.stop_words)


DEFAULT_CONFIG = ValidationConfig()
