"""Round-5 measurement batch: run every outstanding TPU measurement in ONE
process.

Why one process: the axon tunnel bills each process's UPLOAD traffic to the
NEXT process's first device→host download (CLAUDE.md, measured r4/r5 —
primers of 435–1520 s between the round-5 roofline runs).  Four separate
experiment processes pay four multi-minute primers; one process pays one.

Stages (each also runnable standalone):
  1. experiments/vpu_roofline.py     — VPU peak + LIF/suppression roofline
                                       + k-step LIF attempt (VERDICT r4 #2)
  2. experiments/reduced_rate.py     — 12/24 kHz internal-rate refutation
                                       (VERDICT r4 #3)
  3. snn_localization_benchmark --sweep — SNR x reverb dispersion sweep
                                       (VERDICT r4 #4)
  4. target_xylo_localization        — MC rows + 4-convention envelope
                                       (VERDICT r4 #6)

Stdout is one JSON line per stage, tagged by the stage's own "experiment"
field; stderr carries progress.
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "experiments")

from haghighatshoarmuir2024_tpu.utils.cache import prime_transfers  # noqa: E402


def _stage(name):
    print(f"\n===== [{time.strftime('%H:%M:%S')}] {name} =====", file=sys.stderr,
          flush=True)


STAGES = ("roofline", "reduced_rate", "benchmark_sweep", "xylo_envelope")


def main():
    only = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")]
    unknown = [s for s in only if s not in STAGES]
    if unknown:
        # validate BEFORE the primer: a typo'd stage name would otherwise
        # pay the multi-minute first-D2H stall, run nothing, and still
        # print "all stages done"
        sys.exit(f"unknown --only stage(s) {unknown}; valid: {list(STAGES)}")
    sys.argv = [sys.argv[0]]

    t0 = time.time()
    prime_transfers()
    print(f"[primer {time.time() - t0:.1f}s]", file=sys.stderr, flush=True)

    if not only or "roofline" in only:
        _stage("vpu_roofline")
        import vpu_roofline

        vpu_roofline.main()

    if not only or "reduced_rate" in only:
        _stage("reduced_rate")
        import reduced_rate

        reduced_rate.main()

    if not only or "benchmark_sweep" in only:
        _stage("snn_localization_benchmark --sweep")
        import snn_localization_benchmark

        snn_localization_benchmark.sweep(200)

    if not only or "xylo_envelope" in only:
        _stage("target_xylo_localization (tone MC + convention envelope)")
        import target_xylo_localization

        target_xylo_localization.main()

    print(f"\n===== all stages done in {time.time() - t0:.0f}s =====",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
