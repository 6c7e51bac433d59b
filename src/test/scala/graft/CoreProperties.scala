package graft

import graft.core._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure kernel (FIXTURES.md §"property tests"):
  * round-trips, idempotence, determinism, and classifier laws that must hold
  * for ARBITRARY inputs, not just the fixture corpus.
  */
object CoreProperties extends Properties("core") {

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\n', '\t', '(', ')', '\\', '&', '<', '>')))
      .map(_.mkString),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '中', 'ß', '∀', ' '))).map(_.mkString))

  property("base64 round-trips arbitrary bytes") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val a = bs.toArray
      Payload.decodeBase64(Payload.encodeBase64(a)).toOption.get.sameElements(a)
    }

  property("pdf synthesize -> extractText round-trips text (pdftotext form-feed framing)") =
    forAll(textGen) { s =>
      // PDF literal escapes cover \n; bare \r is normalized by the reader
      val t = s.replace("\r", "")
      Pdf.extractText(Pdf.synthesize(t)) == Right(t + "\n\f")
    }

  property("collapseWs is idempotent") = forAll(textGen) { s =>
    val once = Html.collapseWs(s)
    Html.collapseWs(once) == once
  }

  property("collapseWs output never has doubled spaces or edge whitespace") =
    forAll(textGen) { s =>
      val c = Html.collapseWs(s)
      !c.contains("  ") && c == c.trim
    }

  property("decodeEntities is identity without ampersands") =
    forAll(textGen.map(_.filter(_ != '&'))) { s => Html.decodeEntities(s) == s }

  private def utf8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  property("rollingHash kernel equals the code-point fold for arbitrary text") =
    forAll(textGen) { s =>
      val ref = s.codePoints().toArray
        .foldLeft(0L)((h, cp) => (h * 31L + cp) % 2147483647L)
      graft.spark.RollingHashKernel.rollingHash(utf8(s)) == ref
    }

  property("simhash16 kernel equals the per-token majority-bit definition") =
    forAll(textGen) { s =>
      val toks = s.split(" ", -1)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = toks.map { t =>
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      }
      val ref = (0 until 16).map { b =>
        if (hs.count(h => ((h >> b) & 1) == 1) * 2 > hs.length) 1 << b else 0
      }.sum
      graft.spark.SimHashKernel.simhash16(utf8(s)) == ref
    }

  property("detectFileType classifies by exact magic") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val a = bs.toArray
      val t = Payload.detectFileType(a)
      val pdf = a.length > 3 && a.startsWith("%PDF".getBytes("ASCII"))
      val tiff = a.length > 3 &&
        (a.startsWith(Array[Byte](0x49, 0x49, 0x2a, 0x00)) ||
          a.startsWith(Array[Byte](0x4d, 0x4d, 0x00, 0x2a)))
      if (pdf) t == Payload.PDF else if (tiff) t == Payload.TIFF else t == Payload.UNKNOWN
    }

  property("extraction is deterministic for arbitrary text + tool payloads") =
    forAll(textGen, textGen) { (text, tool) =>
      val a = Extractor.extractTurn("c", 0, text, tool)
      val b = Extractor.extractTurn("c", 0, text, tool)
      a == b
    }

  property("extraction never throws; status is always done/error/empty") =
    forAll(textGen, textGen) { (text, tool) =>
      val r = Extractor.extractTurn("c", 0, text, tool)
      Set("done", "error", "").contains(r.status)
    }

  property("identity chain of any length is a no-op") =
    forAll(Gen.chooseNum(0, 8), textGen) { (n, s) =>
      val req = model.RequestJson.parse("c#0",
        s"""{"preprocessors":[${List.fill(n)("\"identity\"").mkString(",")}]}""").toOption.get
      Preprocessors.runChain(req, Payload.bytes(s)).toOption.get.sameElements(Payload.bytes(s))
    }

  property("swt darkOnLight=0 twice restores case") = forAll(textGen) { s =>
    val once = Preprocessors.strokeWidthTransform(Payload.bytes(s), "0")
    val twice = Preprocessors.strokeWidthTransform(once, "0")
    // control chars are stripped on the first pass; the second pass must be
    // case-flip-only, so flip∘flip == first pass with darkOnLight=1
    Payload.utf8(twice) == Payload.utf8(Preprocessors.strokeWidthTransform(Payload.bytes(s), "1"))
  }

  property("multipart round-trips arbitrary boundary-free payloads") =
    forAll(textGen.suchThat(t => !t.contains("--b") && !t.contains("\n\n"))) { t =>
      val body = s"--b\nContent-Type: image/png\n\n$t\n--b--"
      Multipart.extractParts("multipart/related", "b", body) match {
        case Right(x) => Payload.utf8(x.imgBytes) == t.replace("\r\n", "\n")
        case Left(_)  => Prop.falsified != null && false
      }
    }

  private val hostGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))

  property("url policy: validation accepts exactly http/https") =
    forAll(Gen.oneOf("http", "https", "ftp", "file", "mailto", ""), hostGen) { (scheme, host) =>
      val url = if (scheme.isEmpty) host else s"$scheme://$host/x"
      Urls.checkUrlForReplyTo(url).isRight == (scheme == "http" || scheme == "https")
    }

  property("url policy: stripPassword removes the password and only the password") =
    forAll(hostGen, hostGen, hostGen.suchThat(_.nonEmpty)) { (user, host, pass) =>
      val url = s"https://$user:$pass@$host/path"
      val stripped = Urls.stripPassword(url)
      stripped == s"https://$user:***@$host/path"
    }

  property("url policy: stripPassword is identity without userinfo password") =
    forAll(hostGen, hostGen) { (user, host) =>
      Urls.stripPassword(s"https://$host/x") == s"https://$host/x" &&
      Urls.stripPassword(s"https://$user@$host/x") == s"https://$user@$host/x" &&
      Urls.stripPassword(host) == host
    }

  property("timeout clamp is idempotent and lands in (0, default]") =
    forAll(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)) { t =>
      val c = Extractor.clampTimeout(t)
      c > 0 && c <= Extractor.DefaultTimeoutSeconds && Extractor.clampTimeout(c) == c
    }
}
