#!/bin/bash
# Regenerate every committed evidence artifact — the TPU-environment analog
# of the reference's SLURM job scripts (GEMMul8/testing/job-qc-*.sh, which
# run `make test_f test_d MODE="all"` on a cluster node).
#
#   bash scripts/run_evidence.sh cpu   # CPU-backend artifacts (hours)
#   bash scripts/run_evidence.sh tpu   # real-chip artifacts (needs tunnel)
#   bash scripts/run_evidence.sh all
#
# Each step is independently re-runnable; CSVs/plots land in
# results_committed/. NEVER set PYTHONPATH (it breaks the axon TPU
# plugin); the scripts self-insert the repo root.
set -uo pipefail
cd "$(dirname "$0")/.."
mode="${1:-all}"

run() { echo "== $*"; "$@" || echo "!! step failed (continuing): $*"; }

if [[ "$mode" == "cpu" || "$mode" == "all" ]]; then
  # reference-protocol accuracy sweeps on the CPU backend (native-f64
  # ground truth): DGEMM/SGEMM + mixed-dtype md/mf, phi and k sweeps
  run python scripts/accuracy_sweep_cpu.py all
  # weak scaling on the virtual 8-device mesh (collective-overhead proxy)
  run python scripts/weak_scaling.py
  # full test suite (asserted bands, bit-exactness, sharding)
  run python -m pytest tests/ -q
fi

if [[ "$mode" == "tpu" || "$mode" == "all" ]]; then
  # real-chip artifacts: headline bench, throughput sweeps (DGEMM incl.
  # accu + OS-I rows, SGEMM incl. BF16X3-SCALING), complex sweeps, and
  # chip-protocol accuracy evidence (d / f / complex)
  run python bench.py
  run python scripts/time_sweep_tpu.py 4096,8192 all
  run python scripts/accuracy_sweep_tpu.py all
fi

# plots from whatever CSVs exist (plot_results takes CSV paths)
run python scripts/plot_results.py results_committed/oz2_results_*.csv
