#!/bin/bash
# Run a graft main class directly against the compiled classes (skips sbt
# startup). Usage: tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
set -e
CLS="$1"; shift
JAVA_OPTS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  JAVA_OPTS="$JAVA_OPTS --add-opens $p=ALL-UNNAMED"
done
exec java $JAVA_OPTS $GRAFT_JAVA_OPTS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Duser.timezone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLS" "$@"
