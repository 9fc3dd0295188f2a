#!/bin/bash
# Run a graft main from a SNAPSHOT classes dir (arg 1) so sbt recompiles
# in the live tree can't clobber a long background run's classpath.
set -e
cd "$(dirname "$0")/.."
CLS="$1"; MAIN="$2"; shift 2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx${GRAFT_XMX:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" "$MAIN" "$@"
