#!/bin/bash
# Build the reference HyPo binary for differential end-to-end testing.
#
# The reference checkout is read-only, so it is copied to a scratch
# tree first (htslib's in-tree make and cmake's subdirectory builds
# write into the source dir).  Two environment portability fixes are
# applied to the COPY only:
#   - htslib: no configure script / autoreconf in this image -> a
#     minimal config.h (zlib + lzma, no bz2/curl) + make LIBS override;
#   - slog Monitor.hpp: missing #include <string> breaks newer
#     libstdc++.
#
# Usage: tools/build_reference.sh [REFERENCE_DIR] [BUILD_DIR]
# Result: $BUILD_DIR/build/bin/hypo
set -euo pipefail
REF=${1:-/root/reference}
DST=${2:-/tmp/ref_build}

if [ -x "$DST/build/bin/hypo" ]; then
    echo "already built: $DST/build/bin/hypo"
    exit 0
fi

rm -rf "$DST"
mkdir -p "$DST"
cp -r "$REF"/. "$DST"/
chmod -R u+w "$DST"

# portability patch: slog needs <string> with newer libstdc++
for f in "$DST"/external/slog/include/slog/Monitor.hpp \
         "$DST"/external/suk/external/slog/include/slog/Monitor.hpp; do
    [ -f "$f" ] && sed -i 's/#include <chrono>/#include <chrono>\n#include <string>/' "$f"
done

# htslib: build without configure (no autoreconf in this image)
pushd "$DST/external/install/htslib" > /dev/null
printf '/* minimal config.h (zlib+lzma, no bz2/curl) */\n#define HAVE_LIBLZMA 1\n#define HAVE_LZMA_H 1\n#define HAVE_DRAND48 1\n' > config.h
make -j"$(nproc)" NONCONFIGURE_OBJS= LIBS="-lz -lm -llzma -lpthread" libhts.so
mkdir -p lib include
cp -P libhts.so* lib/
rm -rf include/htslib && cp -r htslib include/
popd > /dev/null

mkdir -p "$DST/build"
pushd "$DST/build" > /dev/null
cmake .. -DCMAKE_BUILD_TYPE=Release
make -j"$(nproc)" hypo
popd > /dev/null
echo "built $DST/build/bin/hypo"
