#!/usr/bin/env bash
# Build the hartallo reference (mounted read-only at /root/reference) as a
# test/baseline oracle binary in .refbuild/ (gitignored).
#
# The reference targets MSVC; a handful of mechanical patches are applied to a
# local COPY to make it compile with gcc on Linux. No reference code enters the
# framework — the binary is used only to (a) generate conformance bitstreams,
# (b) provide bit-exact decode output to test against, (c) measure the
# performance baseline (see BASELINE_MEASURED.md).
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-$(dirname "$0")/../.refbuild}
TOOLS=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$OUT" && cd "$OUT"

if [ ! -d ref_source ]; then
  cp -r "$REF/include" ref_include
  cp -r "$REF/source" ref_source
fi
mkdir -p compat && echo '#include <float.h>' > compat/cfloat
cp "$TOOLS/ref_shim.h" shim.h

python3 - <<'EOF'
import re
def patch(path, old, new, required=True):
    s = open(path, 'rb').read()
    if old not in s:
        assert not required or new in s, path  # already applied
        return
    open(path, 'wb').write(s.replace(old, new))

# 1. Broken gcc inline-asm branch (never compiled upstream; MSVC-only project).
patch('ref_include/hartallo/h264/hl_codec_264_bits.h',
      b'''#if defined(__GNUC__)
        uint32_t r = 0;
        __asm__("bt %[self->i_bits_count], %[self->pc_current]; setb %self->i_bits_count[r]" : [r] "=q" (r) : [self->pc_current] "mr" (*self->pc_current), [self->i_bits_count] "r" (self->i_bits_count));
        --self->i_bits_count;
#else /* !__GNUC__ */''',
      b'#if 0\n#else /* !__GNUC__ */')
# 2. rdtsc for non-Windows, non-HL_HAVE_X86_ASM builds.
patch('ref_source/hl_cpu.c',
      b'#else\n#\terror "Not implemented: use rdtsc inline asm"\n#endif',
      b'#else\n    return __builtin_ia32_rdtsc();\n#endif')
# 3. __builtin_bswap32 typo.
patch('ref_include/hartallo/hl_bits.h', b'__builtibswap32', b'__builtin_bswap32')
# 4. Header declares const table, source defines non-const.
patch('ref_source/h264/hl_codec_264_deblock.c',
      b'HARTALLO_EXPORT /*const*/ int32_t HL_CODEC_264_DEBLOCK_THRESHOLD_TABLE',
      b'HARTALLO_EXPORT const int32_t HL_CODEC_264_DEBLOCK_THRESHOLD_TABLE')
# 5. Enum-name typo in me.h prototype (MSVC tolerated the mismatch).
patch('ref_include/hartallo/h264/hl_codec_264_me.h',
      b'HL_CODEC_264_LIST_IDX_Z', b'HL_CODEC_264_LIST_IDX_E')
# 6. me.h uses enums defined in defs.h without including it.
patch('ref_include/hartallo/h264/hl_codec_264_me.h',
      b'#include "hartallo/hl_types.h"',
      b'#include "hartallo/hl_types.h"\n#include "hartallo/h264/hl_codec_264_defs.h"',
      required=False)
print("patches applied")
EOF

CFLAGS="-O3 -w -std=gnu11 -march=native -fcommon -D_GNU_SOURCE -include shim.h -Iref_include -Icompat"
for f in ref_source/*.c ref_source/h264/*.c; do
  b=$(basename "$f" .c)
  case $b in test*) continue;; esac
  gcc $CFLAGS -c "$f" -o "$b.o"
done
for f in ref_source/intrinsics/x86/*.c ref_source/h264/intrinsics/x86/*.c; do
  gcc $CFLAGS -c "$f" -o "intr_$(basename "$f" .c).o"
done
gcc $CFLAGS -c "$TOOLS/ref_driver.c" -o ref_driver.o
gcc -o ref_driver ref_driver.o hl_*.o intr_*.o -lm -lpthread
echo "built: $OUT/ref_driver"
