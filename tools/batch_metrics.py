"""Per-interval JVM / OS / task-metric capture for bench diagnostics.

VERDICT r11 #1: the sf100 append curve held an unexplained 8x wall-time
spike (batch 3: 184.6 s vs a 22 s median) with IDENTICAL work stats —
environmental, not algorithmic, but undiagnosed. This module snapshots
cheap cumulative counters at batch boundaries so every bench batch
carries the evidence needed to attribute such a spike:

- JVM GC time/count (ManagementFactory beans — local mode runs all
  executor threads in the ONE jvm, so this is total GC) and heap use;
- Spark task metrics via executor summary deltas
  (totalDuration/GC/shuffle/input);
- the JVM process's real disk I/O (/proc/<pid>/io read_bytes and
  write_bytes — actual block I/O, not cache hits);
- system pressure: /proc/stat iowait ticks, /proc/meminfo
  Dirty/Writeback/MemAvailable (page-cache writeback stalls are the
  usual "everything I/O-ish got slow at once" culprit on a shared box).

All counters are cumulative; ``delta()`` subtracts snapshots. A
``Sampler`` thread additionally records the within-interval MAX of the
instantaneous gauges (Dirty, Writeback, heap) at ~1 Hz, because a
30-second stall inside a 3-minute batch vanishes in boundary deltas.

Everything here is public-API or /proc reading; the app-status-store
access is best-effort (try/except) so the bench never fails on it.
"""

from __future__ import annotations

import threading
import time


def _read_proc_io(pid: int) -> dict:
    out = {}
    try:
        with open(f"/proc/{pid}/io") as f:
            for line in f:
                k, v = line.split(":")
                out[k.strip()] = int(v)
    except OSError:
        pass
    return out


def _read_meminfo() -> dict:
    out = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                k, rest = line.split(":", 1)
                if k in ("MemAvailable", "Dirty", "Writeback", "Cached"):
                    out[k] = int(rest.strip().split()[0]) * 1024
    except OSError:
        pass
    return out


def _read_cpu_ticks() -> dict:
    """Aggregate cpu line: iowait and steal (field 8 — host CPU taken
    from this VM; the r12 sf100 residual outliers were in-task
    slowdowns with identical work/IO/GC, i.e. steal-shaped)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()  # cpu user nice sys idle iowait irq softirq steal
        return {
            "iowait_ticks": int(parts[5]),
            "steal_ticks": int(parts[8]) if len(parts) > 8 else 0,
        }
    except (OSError, IndexError, ValueError):
        return {"iowait_ticks": 0, "steal_ticks": 0}


def _read_iowait_ticks() -> int:
    return _read_cpu_ticks()["iowait_ticks"]


class BatchMetrics:
    """Cumulative-counter snapshots around a timed interval."""

    def __init__(self, spark):
        self.spark = spark
        jvm = spark.sparkContext._jvm
        self._mf = jvm.java.lang.management.ManagementFactory
        self._pid = int(jvm.java.lang.ProcessHandle.current().pid())
        self._sc = spark.sparkContext

    # ---- cumulative snapshot -------------------------------------------
    def snapshot(self) -> dict:
        s: dict = {"t": time.time()}
        gc_ms = gc_n = 0
        beans = self._mf.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            b = beans.get(i)
            gc_ms += b.getCollectionTime()
            gc_n += b.getCollectionCount()
        s["gc_ms"] = gc_ms
        s["gc_count"] = gc_n
        heap = self._mf.getMemoryMXBean().getHeapMemoryUsage()
        s["heap_used"] = heap.getUsed()
        io = _read_proc_io(self._pid)
        s["jvm_read_bytes"] = io.get("read_bytes", 0)
        s["jvm_write_bytes"] = io.get("write_bytes", 0)
        s.update(_read_cpu_ticks())
        s.update({f"mem_{k}": v for k, v in _read_meminfo().items()})
        # Spark-side cumulative task metrics (best-effort internal API)
        try:
            store = self._sc._jsc.sc().statusStore()
            execs = store.executorList(True)
            dur = tgc = shr = shw = inp = 0
            for i in range(execs.size()):
                e = execs.apply(i)
                dur += e.totalDuration()
                tgc += e.totalGCTime()
                shr += e.totalShuffleRead()
                shw += e.totalShuffleWrite()
                inp += e.totalInputBytes()
            s.update(task_ms=dur, task_gc_ms=tgc, shuffle_read=shr,
                     shuffle_write=shw, input_bytes=inp)
        except Exception:  # noqa: BLE001 — diagnostics must not fail the bench
            pass
        return s

    @staticmethod
    def delta(before: dict, after: dict) -> dict:
        gauges = {"heap_used", "mem_MemAvailable", "mem_Dirty",
                  "mem_Writeback", "mem_Cached"}
        out = {}
        for k, v in after.items():
            if k == "t" or not isinstance(v, (int, float)):
                continue
            if k in gauges:
                out[k + "_end"] = v
            elif k in before:
                out["d_" + k] = v - before[k]
        # tick counters are per-CPU centiseconds summed across CPUs;
        # report as seconds of aggregate time
        for tick, sec in (("d_iowait_ticks", "iowait_sec"),
                          ("d_steal_ticks", "steal_sec")):
            if tick in out:
                out[sec] = round(out.pop(tick) / 100.0, 2)
        for k in ("d_gc_ms", "d_task_ms", "d_task_gc_ms"):
            if k in out:
                out[k.replace("_ms", "_sec")] = round(out.pop(k) / 1000.0, 2)
        return out


class Sampler:
    """~1 Hz gauge sampler: within-interval maxima that boundary deltas
    cannot see (a 30 s writeback stall inside a 3 min batch)."""

    def __init__(self, metrics: BatchMetrics, period: float = 1.0):
        self._m = metrics
        self._period = period
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.maxima: dict = {}

    def __enter__(self) -> "Sampler":
        self._stop.clear()
        self.maxima = {}
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        prev_ticks = _read_iowait_ticks()
        prev_t = time.time()
        while not self._stop.wait(self._period):
            mem = _read_meminfo()
            for k in ("Dirty", "Writeback"):
                if k in mem:
                    key = f"max_mem_{k}"
                    self.maxima[key] = max(self.maxima.get(key, 0), mem[k])
            try:
                with open("/proc/loadavg") as f:
                    load1 = float(f.read().split()[0])
                self.maxima["max_load1"] = max(
                    self.maxima.get("max_load1", 0.0), load1
                )
            except (OSError, ValueError):
                pass
            ticks = _read_iowait_ticks()
            now = time.time()
            if now > prev_t:
                # aggregate iowait cpu-seconds per wall second
                rate = (ticks - prev_ticks) / 100.0 / (now - prev_t)
                self.maxima["max_iowait_cpus"] = round(
                    max(self.maxima.get("max_iowait_cpus", 0.0), rate), 2
                )
            prev_ticks, prev_t = ticks, now

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)


def percentiles(vals: list[float]) -> dict:
    """p50/p95/max for a bench series (VERDICT r11 #1/#2: artifacts
    must carry the percentile truth, not just a median)."""
    if not vals:
        return {}
    xs = sorted(vals)
    def q(p: float) -> float:
        i = min(len(xs) - 1, max(0, round(p * (len(xs) - 1))))
        return xs[int(i)]
    return {
        "p50_sec": round(q(0.50), 3),
        "p95_sec": round(q(0.95), 3),
        "max_sec": round(xs[-1], 3),
        "mean_sec": round(sum(xs) / len(xs), 3),
    }
