#!/bin/bash
# Build the reference JASSv2 binaries (unittest, JASS_index, JASS_anytime)
# out-of-tree, WITHOUT cmake (absent in this environment), for the
# differential byte-parity tests in tests/test_reference_differential.py.
#
# Mirrors the reference CI recipe (.github/workflows/ccpp.yml +
# CMakeLists.txt): C++17, -O2 -march=native -mbmi -mavx2, with the two
# generated translation units (ascii.cpp, unicode.cpp) produced by the
# reference's own generator tools first (tools/CMakeLists.txt:22-41).
# compress_general_zstd.cpp is excluded: libzstd headers are not
# installed here and nothing in the three target binaries references it
# (verified by grep; the zlib path IS compiled).
#
# Usage: tools/build_reference.sh [build_dir]   (default tools/refbuild)
set -euo pipefail

REF=${REF:-/root/reference}
BUILD=${1:-$(dirname "$0")/refbuild}
mkdir -p "$BUILD/obj" "$BUILD/gen"
BUILD=$(cd "$BUILD" && pwd)

CXXFLAGS="-std=c++17 -O2 -march=native -mbmi -mavx2 -w -I$REF/source -I$BUILD/gen"

# --- 1. generator tools (no JASSlib dependency; tools/CMakeLists.txt:35-41,55)
if [ ! -x "$BUILD/ascii_database_to_c" ]; then
  g++ $CXXFLAGS -o "$BUILD/ascii_database_to_c" "$REF/tools/ascii_database_to_c.cpp"
fi
if [ ! -x "$BUILD/unicode_database_to_c" ]; then
  g++ $CXXFLAGS -o "$BUILD/unicode_database_to_c" \
    "$REF/tools/unicode_database_to_c.cpp" \
    "$REF/source/asserts.cpp" "$REF/source/file.cpp" "$REF/source/bitstring.cpp"
fi

# --- 2. generated TUs (tools/CMakeLists.txt:22-33,46-52)
if [ ! -s "$BUILD/gen/ascii.cpp" ]; then
  "$BUILD/ascii_database_to_c" > "$BUILD/gen/ascii.cpp"
fi
if [ ! -s "$BUILD/gen/unicode.cpp" ]; then
  "$BUILD/unicode_database_to_c" \
    "$REF/external/Unicode/UnicodeData.txt" \
    "$REF/external/Unicode/PropList.txt" \
    "$REF/external/Unicode/CaseFolding.txt" > "$BUILD/gen/unicode.cpp"
fi

# --- 3. JASSlib objects (source/CMakeLists.txt JASSlib_FILES minus zstd)
SRCS=$(ls "$REF"/source/*.cpp | grep -v compress_general_zstd)
SRCS="$SRCS $BUILD/gen/ascii.cpp $BUILD/gen/unicode.cpp"

compile_one() {
  src=$1
  obj="$BUILD/obj/$(basename "${src%.*}").o"
  if [ ! -s "$obj" ] || [ "$src" -nt "$obj" ]; then
    g++ $CXXFLAGS -c "$src" -o "$obj"
  fi
}
export -f compile_one
export BUILD CXXFLAGS
printf '%s\n' $SRCS | xargs -P "$(nproc)" -I{} bash -c 'compile_one "$@"' _ {}

# channel_socket.c is NOT in the reference's JASSlib_FILES (dead file
# referencing a nonexistent str.h) — excluded here too.
ar rcs "$BUILD/libJASS.a" "$BUILD"/obj/*.o

# --- 4. target binaries
link() {
  out=$1; shift
  if [ ! -x "$BUILD/$out" ]; then
    g++ $CXXFLAGS -o "$BUILD/$out" "$@" "$BUILD/libJASS.a" -lz -lpthread
  fi
}
link unittest     "$REF/tools/unittest.cpp"
link JASS_index   "$REF/tools/JASS_index.cpp"
link JASS_anytime "$REF/anytime/JASS_anytime.cpp" "$REF/anytime/JASS_anytime_api.cpp"
link test_integer_compress "$REF/tools/test_integer_compress.cpp"
link JASS_eval    "$REF/tools/JASS_eval.cpp"
link ciff_to_JASS "$REF/tools/ciff_to_JASS.cpp"
link trec_to_query "$REF/tools/trec_to_query.cpp"
link JASSv1_to_human "$REF/tools/JASSv1_to_human.cpp"

# differential-test drivers (sources in this repo's tools/)
HERE=$(cd "$(dirname "$0")" && pwd)
link codec_tool     "$HERE/refbuild_codec_tool.cpp"
link serialise_tool "$HERE/refbuild_serialise_tool.cpp"
if [ ! -x "$BUILD/legacy_qmx_tool" ]; then
  g++ -std=c++14 -O2 -march=native -w -I"$REF/JASSv1" \
    -o "$BUILD/legacy_qmx_tool" "$HERE/refbuild_legacy_qmx_tool.cpp" \
    "$REF/JASSv1/compress_qmx.c" "$REF/JASSv1/compress_qmx_d4.c"
fi

echo "OK: $BUILD/{unittest,JASS_index,JASS_anytime,codec_tool,serialise_tool,legacy_qmx_tool}"
