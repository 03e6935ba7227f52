#!/bin/sh
# Regenerate the external JPEG ground-truth fixtures in
# tests/fixtures/jpeg_gt/ with libjpeg (see gen_jpeg_fixture.c for why
# these exist: they break the decode(encode(x)) circularity of the
# pure-Python codec's own tests).  Requires gcc + libjpeg-dev.
set -e
cd "$(dirname "$0")/../tests/fixtures/jpeg_gt"
gcc -O2 -o /tmp/gen_jpeg_fixture "$(dirname "$0")/../../scripts/gen_jpeg_fixture.c" -ljpeg
( cd "$(pwd)" && /tmp/gen_jpeg_fixture )
ls -la
