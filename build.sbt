ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pyrecountspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout (no "[info] " prefix): the
// bench/verify drivers parse the one-line JSON from stdout, and sbt's
// logger prefix breaks line-oriented parsing.
outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  // This VM delivers ~6 effective cores with heavy kernel overhead; C2
  // JIT compilation of Spark's whole-stage-codegen classes caused
  // 200+ s first-run cliffs (measured 218s -> 8s with C1-only). Cap the
  // JIT tier and compiler threads for predictable runs; override via
  // GRAFT_EXTRA_JVM (appended last, wins on duplicate -XX flags).
  "-XX:TieredStopAtLevel=1",
  "-XX:CICompilerCount=2",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] single-JVM Spark: the driver is the executor; 8g caused
  // GC-bound 10-25x slowdowns on shuffle-heavy queries (the box has 128g)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM").map(_.split(" ").toSeq).getOrElse(Seq.empty)
