"""Aggregate throughput of N INDEPENDENT processes each streaming numpy ops
over a private 512 MB buffer — no Ray, no shared state, no coordination.
Perfect scaling is N x single-process rate; any shortfall is the machine
(shared memory bandwidth / VM neighbors), not software."""
import multiprocessing as mp, numpy as np, os, sys, time

def worker(q, cpu):
    os.sched_setaffinity(0, {cpu})
    a = np.random.default_rng(cpu).integers(0, 2**62, size=64_000_000, dtype=np.uint64)
    t0 = time.time(); it = 0
    while time.time() - t0 < 8.0:
        b = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (a >> np.uint64(31))
        s = int(b[::4096].sum())
        it += 1
    q.put((it, time.time() - t0))

def run(n):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, i)) for i in range(n)]
    [p.start() for p in ps]
    res = [q.get() for _ in ps]
    [p.join() for p in ps]
    rate = sum(it / el for it, el in res)  # aggregate passes/sec
    return rate

if __name__ == "__main__":
    for n in (4, 16):
        r = run(n)
        print(f"{n} procs: aggregate {r:.2f} passes/s ({r/n:.3f}/proc)")
