"""Broker: the long-running job-polling service (reference broker.py).

Behavioral parity: 5 s loop period, catch-all error logging so the loop
never dies, RANDOM_SEED seeding per iteration, BROKER_THREADING single-shot
debug mode (broker.py:19,83-92). Structural change: a single-flight
loop (no overlapping timers — the reference's threading.Timer can
double-process a job between poll and the state-3 PATCH; SURVEY.md §5.2).
"""

from __future__ import annotations

import logging
import os
import random
import threading
import time
from datetime import datetime

from videoquery.core.config import BrokerConfig, default_hyperparams, random_seed
from videoquery.service.client import ActionClient, HTTPTransport
from videoquery.service.compute_matches import SearchSetCache, compute_matches
from videoquery.service.lease import LeaseRecovery
from videoquery.service.repository import APIRepository

log = logging.getLogger(__name__)


def setup_logging(config: BrokerConfig) -> None:
    """Per-day log file + stderr, reference format (broker.py:26-31)."""
    os.makedirs(config.log_dir, exist_ok=True)
    logging.basicConfig(
        format="%(asctime)s; %(levelname)s; {%(module)s}; [%(funcName)s] %(message)s",
        level=logging.INFO,
        handlers=[
            logging.FileHandler(
                os.path.join(
                    config.log_dir,
                    "query_broker_{}.log".format(datetime.now().strftime("%Y_%m_%d")),
                )
            ),
            logging.StreamHandler(),
        ],
    )


class Broker:
    def __init__(self, config: BrokerConfig | None = None,
                 client: ActionClient | None = None,
                 exact: bool | None = None):
        self.config = config or BrokerConfig.from_env()
        if exact is None:
            # VIDEOQUERY_EXACT=1 runs the float64 reference-parity similarity
            # path (host BLAS) instead of the f32 device path
            exact = os.environ.get("VIDEOQUERY_EXACT") == "1"
        self.client = client or ActionClient(HTTPTransport(self.config.base_url))
        self.repository = APIRepository(self.client, self.config.base_url)
        self.exact = exact
        self.index_cache = SearchSetCache()
        self.lease_recovery = LeaseRecovery(self.client,
                                            self.config.lease_seconds)
        self._stop = threading.Event()

    def run_once(self) -> None:
        """One poll + compute pass (reference broker.main, broker.py:62-89)."""
        try:
            # reset jobs a crashed broker left "in progress" (SURVEY.md §5.3)
            self.lease_recovery.recover()
            hyperparameters = default_hyperparams()
            seed = random_seed()
            rng = random.Random(seed) if seed is not None else random.Random()
            compute_matches(
                self.repository,
                hyperparameters,
                rng=rng,
                # with RANDOM_SEED set, each job gets a PRNG derived from
                # (seed, query, round, type) so results don't depend on
                # which jobs share a poll (compute_matches._job_rng)
                seed=seed,
                report_dir=self.config.report_dir,
                exact=self.exact,
                index_cache=self.index_cache,
                max_jobs_per_poll=self.config.max_jobs_per_poll,
            )
        except Exception as exc:
            log.error("%s", exc, exc_info=True)

    def run_forever(self) -> None:
        """Single-flight loop: the next poll starts loop_seconds after the
        previous one finishes."""
        while not self._stop.is_set():
            self.run_once()
            self._stop.wait(self.config.loop_seconds)

    def stop(self) -> None:
        self._stop.set()


def main() -> None:
    from videoquery.core.jaxsetup import setup_jax

    setup_jax()
    config = BrokerConfig.from_env()
    setup_logging(config)
    broker = Broker(config)
    if config.threading:
        broker.run_forever()
    else:
        # single-shot mode for debugging (README.md:32-34 contract)
        broker.run_once()


if __name__ == "__main__":
    main()
