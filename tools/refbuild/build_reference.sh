#!/bin/sh
# Build the REFERENCE pipeline (for baseline timing / golden
# regeneration).  Copies /root/reference to a writable dir, drops in the
# hand-written gengetopt shim, fakes the gengetopt binary, and builds.
#
# Usage: tools/refbuild/build_reference.sh [BUILD_DIR]
# Binaries land in BUILD_DIR/bin (default /tmp/refsrc).

set -e
HERE=$(cd "$(dirname "$0")" && pwd)
DEST=${1:-/tmp/refsrc}

rm -rf "$DEST"
cp -r /root/reference "$DEST"
cp "$HERE/options.c" "$HERE/options.h" "$DEST/src/"
# fake gengetopt: "generate" by copying the shim into the requested
# output dir (the Makefile's .make rule deletes options.c/h first, then
# regenerates them through this)
mkdir -p /tmp/refbuild-bin
cat > /tmp/refbuild-bin/gengetopt <<EOF
#!/bin/sh
outdir=src
name=options
for a in "\$@"; do
  case "\$a" in
    --output-dir=*) outdir=\${a#--output-dir=} ;;
    --file-name=*) name=\${a#--file-name=} ;;
  esac
done
cp "$HERE/options.c" "\$outdir/\$name.c"
cp "$HERE/options.h" "\$outdir/\$name.h"
exit 0
EOF
chmod +x /tmp/refbuild-bin/gengetopt

cd "$DEST"
PATH=/tmp/refbuild-bin:$PATH make build STATUS=production CFLAGS= \
    >/tmp/refbuild.log 2>&1 || {
        tail -30 /tmp/refbuild.log
        exit 1
    }
ls bin/
echo "reference built in $DEST/bin"
