"""Driver-side control plane (SURVEY §7.1 M3).

Retry/Backoff/Timeout/CircuitBreaker/RateLimiter/WorkerPool/Scaffold
wrap Spark ACTIONS (not rows): per-row work belongs in Catalyst
expressions; failure/latency/pacing policy belongs where the actions
run — the driver. Signals mirror the reference's event bus.
"""

from . import signals
from .observe import (
    collect_observation,
    observed_concurrent,
    observed_effect,
    observed_filter,
    observed_routing,
    winner_labels,
)
from .pipeline import Pipeline
from .resilience import (
    ActionTimeout,
    CircuitBreaker,
    CircuitOpenError,
    RateLimiter,
    RateLimitExceeded,
    backoff,
    fallback_actions,
    race_actions,
    retry,
    scaffold,
    timeout,
    worker_pool,
)
from .signals import BUS, SignalBus

__all__ = [
    "ActionTimeout",
    "BUS",
    "CircuitBreaker",
    "CircuitOpenError",
    "Pipeline",
    "RateLimitExceeded",
    "RateLimiter",
    "SignalBus",
    "backoff",
    "collect_observation",
    "fallback_actions",
    "observed_concurrent",
    "observed_effect",
    "observed_filter",
    "observed_routing",
    "winner_labels",
    "race_actions",
    "retry",
    "scaffold",
    "signals",
    "timeout",
    "worker_pool",
]
