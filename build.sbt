ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "creditabsoltptomartspark"
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
// The forked main's stdout must reach the caller RAW: sbt's default
// LoggedOutput prefixes every line with "[info] ", which breaks any
// downstream json.loads of the Bench/Verify output lines (the driver's
// BENCH parse has been null every round because of it).
run / outputStrategy := Some(StdoutOutput)
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Catalyst generates one class per codegen'd stage; 30+ queries in one
  // JVM overflow the default 240m code cache, after which HotSpot stops
  // JIT-compiling and whole stages run interpreted (10x slowdowns late in
  // a run). Wide expression chains also exceed the 8000-bytecode
  // DontCompileHugeMethods limit; allowing their compilation keeps the
  // 64-term dot/hash chains on the JIT path.
  "-XX:ReservedCodeCacheSize=768m",
  "-XX:-DontCompileHugeMethods",
)
