#!/usr/bin/env bash
# Release gate (round-4 verdict item #8): any change touching a
# serialiser, codec, tokenizer, or eval path must re-prove BYTE PARITY
# against the compiled reference before shipping. This script is the
# single entry point CI (or a human) runs:
#
#   1. build the reference binaries + libJASS.a from the read-only
#      checkout (idempotent — skips work if tools/refbuild is current);
#   2. run the differential suites, which compare our bytes/ranks against
#      the LIVE compiled tools (JASS_index -I1/-I2/-Ib/-If/-Ic,
#      JASS_anytime, JASS_eval, ciff_to_JASS, codec_tool across the full
#      26-codec registry, trec-query tokenization);
#   3. run the oracle gate on a sample of registry entries vs DuckDB.
#
# Exit nonzero on any divergence. ~10 min on this box.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/3] build reference (tools/build_reference.sh) =="
bash tools/build_reference.sh

echo "== [2/3] differential byte-parity suites =="
python -m pytest -x -q \
  tests/test_reference_differential.py \
  tests/test_codec_differential.py \
  tests/test_eval_differential.py

echo "== [3/3] oracle gate sample =="
python tools/gate_check.py /root/testdata/sf0.01 \
  jass_tokenize_tf jass_bm25_scores jass_quantized_impacts \
  jass_impact_segments jass_topk jass_trec_run jass_v1_binary_roundtrip \
  jass_examine_index jass_bin_to_human ecom19_qrel_lines ecom19_run_lines

echo "RELEASE GATE GREEN"
