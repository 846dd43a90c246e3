package graft

import java.io.{ByteArrayOutputStream, PrintStream, PrintWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Golden-stdout tests for the three CLI entry points (r12 verdict #6):
  * the Hw1/Hw2/Hw3 report formats are snapshot-diffed against CAPTURED
  * REFERENCE RUNS, not just eyeballed.
  *
  * - `hw1_reference.txt` / `hw2_reference.txt` are the reference
  *   programs' actual stdout (`big_data_computing_1.py` / `_2.py` under
  *   pyspark) on the committed `points_sf0001.csv` fixture with the
  *   contract parameters (D=0.5 M=10 K=10 L=4). HW1 is compared
  *   VALUE-EXACT with only timing digits masked — outlier count, the K
  *   reported points (reference tie order: count then input position),
  *   cell ids and sizes all byte-match. HW2 masks the radius-dependent
  *   values too (the reference draws its first FFT center uniformly at
  *   random, `big_data_computing_2.py:19`, so its radius is not
  *   replayable), pinning the full line format.
  * - `hw3_golden.txt` pins Hw3Main on a deterministic socket feed
  *   (exactly n items, fixed seed): the reference's DStreams runtime
  *   (`pyspark.streaming`) no longer exists under Spark 4, so the line
  *   formats are pinned against the reference's literal format strings
  *   (`big_data_computing_3.py:101-137`). The header/engine/EXACT
  *   sections compare value-exact; the reservoir/sticky sections are
  *   structure-pinned (see [[maskSampled]]).
  */
class GoldenStdoutSpec extends AnyFunSuite with SharedSpark {

  private val fixture = "src/test/resources/golden/points_sf0001.csv"

  private def capture(body: => Unit): Seq[String] = {
    val baos = new ByteArrayOutputStream()
    val ps = new PrintStream(baos, true, "UTF-8")
    Console.withOut(ps)(body)
    ps.flush()
    new String(baos.toByteArray, StandardCharsets.UTF_8)
      .split("\n", -1).toSeq.dropRight(1) // trailing split artifact
  }

  private def golden(name: String): Seq[String] =
    new String(Files.readAllBytes(
      Paths.get(s"src/test/resources/golden/$name")),
      StandardCharsets.UTF_8).split("\n", -1).toSeq.dropRight(1)

  private def maskTimings(lines: Seq[String]): Seq[String] = lines.map { l =>
    if (l.startsWith("Running time of")) l.replaceAll("[0-9]+", "<N>") else l
  }

  private def maskRandomDependent(lines: Seq[String]): Seq[String] =
    maskTimings(lines).map { l =>
      if (l.startsWith("Radius =") || l.startsWith("Number of sure outliers") ||
          l.startsWith("Number of uncertain points"))
        l.replaceAll("[0-9][0-9.]*", "<N>")
      else l
    }

  test("Hw1Main stdout byte-matches the captured reference run (timings masked)") {
    // spark must be up before the main so AppSession reuses (not owns) it
    assert(spark.sparkContext.isStopped === false)
    val ours = capture {
      graft.apps.Hw1Main.main(Array("0.5", "10", "10", "4", fixture))
    }.map(_.replace(fixture, "<FIXTURE>"))
    assert(!spark.sparkContext.isStopped,
      "a CLI main must not stop a session it did not create")
    assert(maskTimings(ours) === maskTimings(golden("hw1_reference.txt")),
      "Hw1Main output diverged from the reference capture")
  }

  test("Hw2Main stdout matches the captured reference run (random-radius values masked)") {
    val ours = capture {
      graft.apps.Hw2Main.main(Array(fixture, "10", "10", "4", "--seed", "7"))
    }.map(_.replace(fixture, "<FIXTURE>"))
    assert(maskRandomDependent(ours) ===
      maskRandomDependent(golden("hw2_reference.txt")),
      "Hw2Main output diverged from the reference capture")
  }

  /** The randomized estimator sections are STRUCTURE-pinned, not
    * value-pinned: Spark's socket micro-batch source round-robins its
    * buffered rows across partitions, so the reservoir/sticky RNG draw
    * sequence sees a carving-dependent permutation of the stream (the
    * reference's single-receiver DStream folds in strict arrival order;
    * the estimators' guarantees are permutation-invariant, their traces
    * are not). The EXACT section is order-free and stays value-exact. */
  private def maskSampled(lines: Seq[String]): Seq[String] = {
    val afterExact = lines.indexWhere(_ == "RESERVOIR SAMPLING")
    val (exactPart, sampledPart) = lines.splitAt(afterExact)
    val masked = sampledPart.map { l =>
      if (l.matches("^-?[0-9]+ [+-]$")) "<ITEM>"
      else if (l.startsWith("Number of estimated frequent items"))
        "Number of estimated frequent items = <N>"
      else if (l.startsWith("Number of items in the Hash Table"))
        "Number of items in the Hash Table = <N>"
      else l
    }
    // collapse runs of masked items: the sampled-set SIZE is itself a
    // random variable, so the line count must not distinguish runs
    exactPart ++ masked.foldLeft(Vector.empty[String]) { (acc, l) =>
      if (l == "<ITEM>" && acc.lastOption.contains("<ITEM>")) acc else acc :+ l
    }
  }

  test("Hw3Main stdout: exact section value-pinned, sampled sections structure-pinned") {
    val server = new ServerSocket(0)
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream)
        // exactly n = 500 items: skewed so the three report sections
        // disagree interestingly (0..19 uniform, then a hot tail of 3s)
        var i = 0
        while (i < 400) { out.println(i % 20); i += 1 }
        while (i < 500) { out.println(3); i += 1 }
        out.flush()
        Thread.sleep(30000) // hold the connection; the query stops itself
        sock.close()
      } catch { case _: Throwable => () }
    })
    feeder.setDaemon(true)
    feeder.start()
    val ours = capture {
      graft.apps.Hw3Main.main(Array("500", "0.04", "0.02", "0.1",
        server.getLocalPort.toString, "localhost", "42"))
    }
    server.close()
    val goldenPath = Paths.get("src/test/resources/golden/hw3_golden.txt")
    if (!Files.exists(goldenPath)) {
      Files.write(goldenPath,
        (ours.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      fail(s"hw3 golden regenerated at $goldenPath — review and re-run")
    }
    // mask the ephemeral port and the carving-permuted sampled sections;
    // the header/engine/EXACT sections are value-exact
    def norm(ls: Seq[String]): Seq[String] = maskSampled(ls.map(
      _.replaceAll("port = [0-9]+", "port = <PORT>")))
    assert(norm(ours) === norm(golden("hw3_golden.txt")),
      "Hw3Main output diverged from the seeded golden")
  }
}
