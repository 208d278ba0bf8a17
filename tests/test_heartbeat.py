"""Heartbeat watchdog (reference DistributedTimeoutWrapper semantics)."""

import time

from espresso_tpu.train.heartbeat import HeartbeatMonitor


def test_fires_on_stall():
    fired = []
    with HeartbeatMonitor(0.2, on_timeout=fired.append, poll_interval=0.02) as hb:
        time.sleep(0.5)
    assert hb.fired and fired == [0.2]


def test_pings_prevent_firing():
    fired = []
    with HeartbeatMonitor(0.25, on_timeout=fired.append, poll_interval=0.02) as hb:
        for _ in range(6):
            time.sleep(0.1)
            hb.ping()
    assert not hb.fired and fired == []


def test_disabled_never_starts():
    hb = HeartbeatMonitor(-1).start()
    assert not hb.enabled and hb._thread is None
    hb.stop()


def test_stop_prevents_late_fire():
    fired = []
    hb = HeartbeatMonitor(0.2, on_timeout=fired.append, poll_interval=0.02).start()
    hb.stop()
    time.sleep(0.4)
    assert fired == []
