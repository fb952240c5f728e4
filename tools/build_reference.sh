#!/bin/bash
# Build the reference panSVR + deBGA binaries into /tmp/refbuild for
# golden-parity testing (never writes to /root/reference).
set -e
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
if [ ! -d /tmp/refbuild ]; then
    cp -r /root/reference /tmp/refbuild
fi
cd /tmp/refbuild/Release && make all -j"$(nproc)"
# -fcommon needed: deBGA relies on pre-C99 tentative definitions
cd /tmp/refbuild/deBGA_release/src && make CC="gcc -fcommon" -j"$(nproc)"
echo "panSVR: /tmp/refbuild/Release/panSVR"
echo "deBGA:  /tmp/refbuild/deBGA_release/deBGA"

# vcf2bcf golden-fixture tool: converts text VCF to binary BCF with the
# reference's own vendored htslib (for tests/golden/test_bcf_golden.py)
H=/tmp/refbuild/Release/src/htslib
if [ -f "$H/vcf.o" ] && [ ! -x /tmp/refbuild/vcf2bcf ]; then
    OBJS="$(ls $H/*.o | grep -v -E 'bgzip|htsfile|tabix|hfile_gcs') $(ls $H/cram/*.o)"
    gcc -O2 -I/root/reference/src -I/root/reference/src/htslib \
        "$SCRIPT_DIR/vcf2bcf.c" $OBJS -o /tmp/refbuild/vcf2bcf \
        -lz -lpthread -lm && echo "vcf2bcf: /tmp/refbuild/vcf2bcf"
fi
