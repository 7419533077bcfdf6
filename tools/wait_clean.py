"""Block until the host offers a clean measurement window: load1 low
(checked BEFORE probing — the matmul probe itself spikes load) and two
consecutive fast matmul probes, spaced 30s."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def probe():
    a = np.full((2000, 2000), 0.5)
    t0 = time.perf_counter(); a @ a
    return time.perf_counter() - t0

deadline = time.monotonic() + float(os.environ.get("WAIT_CLEAN_MAX", "2400"))
streak = 0
while time.monotonic() < deadline:
    load = os.getloadavg()[0]
    if load > 1.0:
        print(f"load1={load:.2f} (busy)", flush=True)
        streak = 0
        time.sleep(20)
        continue
    m = probe()
    streak = streak + 1 if m < 0.30 else 0
    print(f"load1={load:.2f} matmul={m:.3f} streak={streak}", flush=True)
    if streak >= 2:
        print("CLEAN"); sys.exit(0)
    time.sleep(30)
print("TIMEOUT"); sys.exit(1)
