"""Job-runner configuration (SURVEY.md §2.11 X1, X4).

The reference's DAGFactory pins retries=5 / 5-minute delay, a
15-hour execution timeout, failure/success callbacks, and
``wait_for_downstream`` serialization
(``airflow/dag_factory.py:4-98``). The engine keeps the same knobs as
a plain dataclass + a run wrapper: orchestration stays outside the
engine (Airflow, cron, anything), but pipelines declare their retry/
timeout/callback contract in one place.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class JobConfig:
    """Reference DEFAULT_ARGS equivalents
    (``airflow/dag_factory.py:70-77``)."""

    name: str
    retries: int = 5
    retry_delay_s: float = 300.0
    timeout_s: float = 15 * 3600
    on_failure: Callable[[str, Exception], None] | None = None
    on_success: Callable[[str], None] | None = None
    tags: list[str] = field(default_factory=list)


def run_job(
    config: JobConfig,
    fn: Callable[[], object],
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> object:
    """Run ``fn`` under the job contract: retry with fixed delay,
    overall timeout, notify callbacks (reference: slack on failure,
    heartbeat on success, ``utils/notifications.py:10-45`` — both
    injected here rather than hardcoded to a vendor)."""
    start = clock()
    last: Exception | None = None
    for attempt in range(config.retries + 1):
        if clock() - start > config.timeout_s:
            break
        try:
            result = fn()
            if config.on_success:
                config.on_success(config.name)
            return result
        except Exception as ex:  # noqa: BLE001
            last = ex
            if attempt < config.retries and clock() - start <= config.timeout_s:
                sleep(config.retry_delay_s)
    if config.on_failure and last is not None:
        config.on_failure(config.name, last)
    raise last if last else TimeoutError(f"job {config.name} timed out")
