#!/bin/bash
# Dev-only: run graft.Profile directly on compiled classes (no sbt overhead).
# Usage: tools/runprofile.sh <sfDir> <query>... [MEM env: GRAFT_PROFILE_MEM]
set -e
REPO=/root/repo
MEM="${GRAFT_PROFILE_MEM:-48}"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
CLASSES="${GRAFT_BENCH_CLASSES:-$REPO/target/scala-2.13/classes}"
exec java -Xmx${MEM}g $AO \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Profile "$@"
