"""Driver-side resource monitor for the engine's own Spark jobs —
SURVEY §7 step 6's 'metrics listener → TSV' piece.

The reference monitors each per-tile child process (worker.py:718-736);
`_subprocess_worker` reproduces that for external binaries. This module
closes the loop for native Spark work: a context manager samples the
driver JVM's CPU/RSS plus the active-stage count from ``StatusTracker``
every ``interval`` seconds and appends rows in the exact TSV layout
``recorder.parse_log`` consumes (timestamp, tile, pid, cpu_user,
cpu_sys, rss), so the same per-tile summary/plot tooling covers both
subprocess workers and in-engine jobs.

Scale note: this is a *driver* observer — O(1) memory, one tiny row per
interval, no executor-side hooks — so it is safe at any cluster size;
per-task metrics remain the scheduler's job (Spark UI/event log), which
an engine library should not duplicate.
"""

from __future__ import annotations

import datetime
import os
import threading

from pyspark.sql import SparkSession


def _proc_cpu_rss(pid: int) -> tuple[float, float, int]:
    """(cpu_user_s, cpu_sys_s, rss_bytes) for a pid from /proc — the
    same counters psutil reads, no dependency."""
    tck = float(os.sysconf("SC_CLK_TCK"))
    page = os.sysconf("SC_PAGE_SIZE")
    with open(f"/proc/{pid}/stat", "rb") as f:
        fields = f.read().rsplit(b")", 1)[1].split()
    return int(fields[11]) / tck, int(fields[12]) / tck, int(fields[21]) * page


class JobMonitor:
    """Sample driver resource usage while Spark jobs run.

    >>> with JobMonitor(spark, mon_dir, label="ingest", interval=1.0):
    ...     df.write.parquet(...)

    Writes ``<mon_dir>/tile=<label>.pid=<pid>.tsv`` on exit; read it
    back with ``recorder.parse_log`` / ``per_tile_summary``.
    """

    def __init__(
        self,
        spark: SparkSession,
        monitor_dir: str,
        label: str = "job",
        interval: float = 1.0,
    ) -> None:
        self.spark = spark
        self.monitor_dir = monitor_dir
        self.label = label
        self.interval = interval
        self._samples: list[str] = []
        #: active-stage count per sample (same cadence as the TSV rows) —
        #: driver-side job progress, exposed for callers; not part of the
        #: reference TSV layout.
        self.stage_samples: list[int] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # The JVM is the process doing the work in local mode; in cluster
    # mode this still reports the driver JVM, which is the right scope
    # for a driver-side observer.
    def _jvm_pid(self) -> int:
        gw = self.spark.sparkContext._gateway
        proc = getattr(gw, "proc", None)
        if proc is not None and proc.pid:
            return int(proc.pid)
        return os.getpid()  # connect/embedded fallback: monitor ourselves

    def _loop(self) -> None:
        pid = self._jvm_pid()
        tracker = self.spark.sparkContext.statusTracker()
        while True:
            try:
                cpu_u, cpu_s, rss = _proc_cpu_rss(pid)
            except (OSError, IndexError, ValueError):
                break
            self.stage_samples.append(len(tracker.getActiveStageIds()))
            ts = datetime.datetime.now(datetime.timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S.%f"
            )
            self._samples.append(
                f"{ts}\t{self.label}\t{pid}\t{cpu_u}\t{cpu_s}\t{rss}"
            )
            if self._stop.wait(self.interval):
                break

    def __enter__(self) -> "JobMonitor":
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc: object) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        if not self._samples:
            return
        os.makedirs(self.monitor_dir, exist_ok=True)
        pid = self._samples[-1].split("\t")[2]
        path = os.path.join(self.monitor_dir, f"tile={self.label}.pid={pid}.tsv")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("\n".join(self._samples) + "\n")
        os.replace(tmp, path)
