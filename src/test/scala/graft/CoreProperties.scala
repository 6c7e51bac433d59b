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

  property("chunk formulas cover every token, no empty/misaligned chunk, bounded overlap") =
    forAll(Gen.chooseNum(1, 5000)) { n =>
      import graft.operators.Packing.{chunkTokens => ct, chunkStride => cs}
      // the CLOSED FORM both the Spark operator and the DuckDB twin use
      val nChunks = if (n <= ct) 1 else (n - ct + cs - 1) / cs + 1
      val spans = (0 until nChunks).map { i =>
        val start = i * cs
        (start, math.min(ct, n - start))
      }
      spans.forall { case (s, len) => len > 0 && s % cs == 0 && s + len <= n } &&
      spans.last._1 + spans.last._2 == n && // last chunk reaches the end...
      spans.init.forall { case (s, len) => len == ct } && // ...others are full
      // consecutive full chunks overlap by exactly chunkTokens - stride
      spans.sliding(2).forall {
        case Seq((a, _), (b, _)) => b - a == cs
        case _                   => true
      }
    }

  property("winnowing: docs sharing a run >= W+S-1 tokens share a fingerprint at ANY alignment") = {
    import graft.operators.Dedup.{windowTokens => w, windowStride => s}
    val tok: Gen[String] = Gen.chooseNum(0, 50).map(i => s"t$i")
    val toks: Gen[List[String]] = Gen.listOf(tok)
    forAll(toks, toks, Gen.chooseNum(0, 40), Gen.chooseNum(0, 40)) { (pre1, pre2, cut1, cut2) =>
      // a shared verbatim run of exactly W + S - 1 distinct-vocab tokens
      // inserted at ARBITRARY offsets into otherwise-arbitrary docs (the
      // round-5 review found the positional-stride scheme missed exactly
      // the misaligned cases; winnowing's content-defined selection must
      // catch them all)
      val run = (1 to (w + s - 1)).map(i => s"run$i")
      val d1 = pre1.take(cut1) ++ run ++ pre1.drop(cut1)
      val d2 = pre2.take(cut2) ++ run ++ pre2.drop(cut2)
      TextMirrors.winnowedFps(d1).intersect(TextMirrors.winnowedFps(d2)).nonEmpty
    }
  }

  /** Structured crawl-URL generator: every combination of case-mixed
    * scheme/host, userinfo, default/explicit port, path segments with
    * reserved/unreserved/malformed escapes and empty runs, tracking and
    * look-alike query params, and fragments (incl. '?' inside).
    */
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS", "Http")
    userinfo <- Gen.oneOf("", "user@", "user:Pw@")
    host <- Gen.oneOf("Example.COM", "a-b.example.org", "192.168.0.1",
      "sub.EXAMPLE.co.uk")
    port <- Gen.oneOf("", ":80", ":443", ":8443")
    nseg <- Gen.choose(0, 3)
    segs <- Gen.listOfN(nseg, Gen.oneOf("a", "B", "p%2fq", "%7Euser", "x%2",
      "p%zz", "docs", ""))
    slash <- Gen.oneOf("", "/", "//")
    nq <- Gen.choose(0, 4)
    params <- Gen.listOfN(nq, Gen.oneOf("utm_source=f", "utm_x=1", "fbclid=z",
      "fbclident=1", "a=1", "b=2", "q=%41", "utm=keep", "x=%3d", ""))
    frag <- Gen.oneOf("", "#f", "#a?b")
  } yield {
    val path = if (segs.isEmpty) "" else "/" + segs.mkString("/")
    val query = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$userinfo$host$port$path$slash$query$frag"
  }

  property("url canonicalization is IDEMPOTENT (a canonical url is its own dedup key)") =
    forAll(urlGen) { u =>
      val once = Urls.canonicalize(u)
      Urls.canonicalize(once) == once
    }

  property("canonical http(s) urls: no fragment, no tracking params, sorted query") =
    forAll(urlGen) { u =>
      val c = Urls.canonicalize(u)
      val qi = c.indexOf('?')
      val params = if (qi < 0) Seq.empty[String]
        else c.substring(qi + 1).split("&", -1).toSeq
      !c.contains("#") &&
        params == params.sorted &&
        params.forall { p =>
          val k = p.takeWhile(_ != '=')
          k != "fbclid" && !k.startsWith("utm_")
        }
    }

  property("url canonicalization is TOTAL on arbitrary garbage (never throws)") =
    forAll(textGen) { s => Urls.canonicalize(s) != null }
}

/** Pure-Scala mirrors of columnar text kernels, shared by the ScalaCheck
  * laws above and the PipelineSpec parity tests that pin them to the
  * operators' actual Spark output (so the mirror cannot drift silently).
  */
object TextMirrors {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Mirror of [[graft.operators.Dedup.windowFingerprints]]'s per-document
    * selection: md5 of every windowTokens-token window (stride 1), winnowed
    * to the minimum of every windowStride consecutive window positions
    * (whole-list minimum when fewer windows than a span).
    */
  def winnowedFps(toks: Seq[String]): Set[String] = {
    import graft.operators.Dedup.{windowTokens => w, windowStride => s}
    if (toks.size < w) Set.empty
    else {
      val wfps = toks.sliding(w).map(win => md5hex(win.mkString(" "))).toVector
      (0 until math.max(wfps.size - s + 1, 1))
        .map(i => wfps.slice(i, i + s).min).toSet
    }
  }
}
