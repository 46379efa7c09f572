#!/usr/bin/env python3
"""Machine scaling-ceiling probe used by BENCH/BASELINE.md: pure-ALU
multiprocessing busy-loop at 8 vs 32 workers — no memory traffic, so the
result is the best N->4N scaling this VM can physically deliver."""
import multiprocessing as mp, time

def burn(n):
    x = 0
    t0 = time.time()
    while time.time() - t0 < 3.0:
        for i in range(100000):
            x += i * i % 7
        n.value += 100000

if __name__ == "__main__":
    results = {}
    for threads in (8, 32):
        counters = [mp.Value('l', 0) for _ in range(threads)]
        ps = [mp.Process(target=burn, args=(c,)) for c in counters]
        [p.start() for p in ps]
        [p.join() for p in ps]
        total = sum(c.value for c in counters)
        results[threads] = total / 3.0
        print(f"{threads} workers: {total/3.0/1e6:.1f} Mops/s "
              f"(per-worker {total/3.0/threads/1e6:.2f})")
    eff = results[32] / (4 * results[8])
    print(f"8->32 scaling: {results[32]/results[8]:.2f}x of 4x "
          f"(efficiency ceiling {eff:.2f})")
