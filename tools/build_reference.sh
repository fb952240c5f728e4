#!/bin/bash
# Build the reference panSVR + deBGA binaries into /tmp/refbuild for
# golden-parity testing (never writes to /root/reference).
set -e
if [ ! -d /tmp/refbuild ]; then
    cp -r /root/reference /tmp/refbuild
fi
cd /tmp/refbuild/Release && make all -j"$(nproc)"
# -fcommon needed: deBGA relies on pre-C99 tentative definitions
cd /tmp/refbuild/deBGA_release/src && make CC="gcc -fcommon" -j"$(nproc)"
echo "panSVR: /tmp/refbuild/Release/panSVR"
echo "deBGA:  /tmp/refbuild/deBGA_release/deBGA"
