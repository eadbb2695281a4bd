package graft.core

/** Token model mirroring the reference tokenizer's output sum type
  * (reference: tokenizer/token.v:5-96).
  *
  * The reference distinguishes a *missing* doctype name/public-id/system-id
  * from the empty string with a 4-NUL sentinel (tokenizer/token.v:11); we keep
  * the same in-band sentinel so the quirk at tokenizer/tokenizer.v:2301-2311
  * (system-id assigned on a copy, content appended onto the sentinel) is
  * representable byte-for-byte.
  */
sealed trait Tok extends Serializable

/** One token per character, exactly like the reference
  * (tokenizer/token.v:82-85). Only materialized by fixture sinks; production
  * sinks coalesce.
  */
final case class TChar(cp: Int) extends Tok

final case class TTag(
    isStart: Boolean,
    name: String,
    selfClosing: Boolean,
    attrs: Vector[(String, String)]
) extends Tok

final case class TComment(data: String) extends Tok

final case class TDoctype(
    name: String,
    publicId: String,
    systemId: String,
    forceQuirks: Boolean
) extends Tok

final case class TEof(name: String, msg: String) extends Tok

object Tok {
  /** 4-NUL "missing" sentinel (tokenizer/token.v:11). */
  final val Missing: String = "\u0000\u0000\u0000\u0000"

  // EOF name/msg constants (tokenizer/parse_error.v:4-19).
  final val EofGenericName = "EOF"
  final val EofGenericMsg = "The end of the file has been reached."
  final val EofInDoctypeName = "EOF in doctype."
  final val EofInDoctypeMsg =
    "This error occurs if the parser encounter the end of the input stream in a DOCTYPE. In such a case, if the DOCTYPE is correctly placed as a document preamble, the parser sets the Document to quirks mode."
  final val EofBeforeTagNameName = "EOF before tag name."
  final val EofBeforeTagNameMsg =
    "This error occurs if the parser encounters the end of the input stream where a tag name is expected. In this case the parser treats the beginning of a start tag (i.e., `<`) or an end tag (i.e., `</`) as text content."
  final val EofInTagName = "EOF in tag."
  final val EofInTagMsg =
    "This error occurs if the parser encounters the end of the input stream in a start tag or an end tag (e.g., `<div id=`). Such a tag is ignored."
  final val EofInScriptName = "EOF in script HTML comment like text."
  final val EofInScriptMsg =
    "This error occurs if the parser encounters the end of the input stream in text that resembles an HTML comment inside `script` element content (e.g., `<script><!-- foo`)."
  final val EofInCdataName = "EOF in CDATA."
  final val EofInCdataMsg =
    "This error occurs if the parser encounters the end of the input stream in a CDATA section. The parser treats such CDATA sections as if they are closed immediately before the end of the input stream."
  final val EofInCommentName = "EOF in comment."
  final val EofInCommentMsg =
    "This error occurs if the parser ecounters the end of the input stream in a comment. The parser treats such comments as if they are closed immediately before the end of the input stream."
}

/** Receives tokenizer events. Production sinks coalesce character tokens
  * instead of allocating one object per char (the reference allocates one
  * CharacterToken per char, tokenizer/token.v:82-85 — a cost we do not copy).
  */
trait TokenSink {
  def char(cp: Int): Unit
  /** Bulk character-run delivery from the tokenizer's batched loops —
    * semantically identical to `char` per element; sinks override for a
    * monomorphic tight loop.
    */
  def chars(src: Array[Int], from: Int, until: Int): Unit = {
    var i = from
    while (i < until) { char(src(i)); i += 1 }
  }
  /** ASCII-byte-mode twin of `chars` (src values guaranteed 0x00-0x7f). */
  def charsAscii(src: Array[Byte], from: Int, until: Int): Unit = {
    var i = from
    while (i < until) { char(src(i).toInt); i += 1 }
  }
  def tag(isStart: Boolean, name: String, selfClosing: Boolean, attrs: Vector[(String, String)]): Unit
  /** Extract-mode tree feedback: true while the insertion point is inside
    * foreign content (svg/math), where `<![CDATA[` opens a real CDATA
    * section (WHATWG §13.2.5.42) instead of a bogus comment. Fidelity mode
    * ignores this (the reference's CDATA branch is dead code, `if false` at
    * tokenizer/tokenizer.v:1668).
    */
  def inForeignContent: Boolean = false
  def comment(data: String): Unit
  def doctype(name: String, publicId: String, systemId: String, forceQuirks: Boolean): Unit
  def eof(name: String, msg: String): Unit
  /** Parse errors are collected per-row, never printed (the reference
    * printlns, tokenizer/tokenizer.v:346-348). */
  def parseError(code: String): Unit
}

/** Fixture sink: materializes the exact token vector. */
final class CollectingSink extends TokenSink {
  val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
  val errors = scala.collection.mutable.ArrayBuffer.empty[String]
  def char(cp: Int): Unit = toks += TChar(cp)
  def tag(isStart: Boolean, name: String, selfClosing: Boolean, attrs: Vector[(String, String)]): Unit =
    toks += TTag(isStart, name, selfClosing, attrs)
  def comment(data: String): Unit = toks += TComment(data)
  def doctype(name: String, publicId: String, systemId: String, forceQuirks: Boolean): Unit =
    toks += TDoctype(name, publicId, systemId, forceQuirks)
  def eof(name: String, msg: String): Unit = toks += TEof(name, msg)
  def parseError(code: String): Unit = errors += code

  /** Concatenated character-token text (the byte-fidelity payload). */
  def charText: String = {
    val sb = new java.lang.StringBuilder
    toks.foreach { case TChar(cp) => sb.appendCodePoint(cp); case _ => () }
    sb.toString
  }
}

/** Zero-allocation fidelity sink: counts character tokens in UTF-16 code
  * units (== fidelityText.length) without materializing tokens — reused
  * across a partition's rows in the q_tokenize_fidelity kernel.
  */
final class FidelityCountSink extends TokenSink {
  var nChars = 0L
  def reset(): Unit = nChars = 0L
  def char(cp: Int): Unit = nChars += (if (cp >= 0x10000) 2 else 1)
  override def chars(src: Array[Int], from: Int, until: Int): Unit = {
    var i = from
    while (i < until) { nChars += (if (src(i) >= 0x10000) 2 else 1); i += 1 }
  }
  override def charsAscii(src: Array[Byte], from: Int, until: Int): Unit =
    nChars += until - from
  def tag(isStart: Boolean, name: String, selfClosing: Boolean, attrs: Vector[(String, String)]): Unit = ()
  def comment(data: String): Unit = ()
  def doctype(name: String, publicId: String, systemId: String, forceQuirks: Boolean): Unit = ()
  def eof(name: String, msg: String): Unit = ()
  def parseError(code: String): Unit = ()
}
