package graft.core

/** Tokenizer states (reference: tokenizer/tokenizer.v:23-106). Int constants
  * so the dispatch is a dense tableswitch inside the kernel hot loop.
  */
object St {
  final val None = 0
  final val AfterAttrName = 1
  final val AfterAttrValueQuoted = 2
  final val AfterDoctypeName = 3
  final val AfterDoctypePublicIdentifier = 4
  final val AfterDoctypePublicKeyword = 5
  final val AfterDoctypeSystemIdentifier = 6
  final val AfterDoctypeSystemKeyword = 7
  final val AmbiguousAmpersand = 8
  final val AttrName = 9
  final val AttrValueDblQuoted = 10
  final val AttrValueSglQuoted = 11
  final val AttrValueUnquoted = 12
  final val BeforeAttrName = 13
  final val BeforeAttrValue = 14
  final val BeforeDoctypeName = 15
  final val BeforeDoctypePublicIdentifier = 16
  final val BetweenDoctypePublicAndSystemIdentifiers = 17
  final val BeforeDoctypeSystemIdentifier = 18
  final val BogusComment = 19
  final val BogusDoctype = 20
  final val CdataSection = 21
  final val CdataSectionBracket = 22
  final val CdataSectionEnd = 23
  final val CharReference = 24
  final val Comment = 25
  final val CommentEnd = 26
  final val CommentEndBang = 27
  final val CommentEndDash = 28
  final val CommentLtSign = 29
  final val CommentLtSignBang = 30
  final val CommentLtSignBangDash = 31
  final val CommentLtSignBangDashDash = 32
  final val CommentStart = 33
  final val CommentStartDash = 34
  final val Data = 35
  final val DecimalCharReference = 36
  final val DecimalCharReferenceStart = 37
  final val Doctype = 38
  final val DoctypeName = 39
  final val DoctypePublicIdentifierDblQuoted = 40
  final val DoctypePublicIdentifierSglQuoted = 41
  final val DoctypeSystemIdentifierDblQuoted = 42
  final val DoctypeSystemIdentifierSglQuoted = 43
  final val EndTagOpen = 44
  final val Eof = 45
  final val HexCharReference = 46
  final val HexCharReferenceStart = 47
  final val MarkupDeclarationOpen = 48
  final val NamedCharReference = 49
  final val NumCharReference = 50
  final val NumCharReferenceEnd = 51
  final val Plaintext = 52
  final val Rawtext = 53
  final val RawtextEndTagName = 54
  final val RawtextEndTagOpen = 55
  final val RawtextLtSign = 56
  final val Rcdata = 57
  final val RcdataEndTagName = 58
  final val RcdataEndTagOpen = 59
  final val RcdataLtSign = 60
  final val SelfClosingStartTag = 61
  final val ScriptData = 62
  final val ScriptDataDoubleEscaped = 63
  final val ScriptDataDoubleEscapeEnd = 64
  final val ScriptDataDoubleEscapeStart = 65
  final val ScriptDataDoubleEscapedDash = 66
  final val ScriptDataDoubleEscapedDashDash = 67
  final val ScriptDataDoubleEscapedLtSign = 68
  final val ScriptDataEndTagName = 69
  final val ScriptDataEndTagOpen = 70
  final val ScriptDataEscapeStart = 71
  final val ScriptDataEscapeStartDash = 72
  final val ScriptDataEscaped = 73
  final val ScriptDataEscapedDash = 74
  final val ScriptDataEscapedDashDash = 75
  final val ScriptDataEscapedEndTagOpen = 76
  final val ScriptDataEscapedEndTagName = 77
  final val ScriptDataEscapedLtSign = 78
  final val ScriptDataLtSign = 79
  final val TagName = 80
  final val TagOpen = 81

  /** Names for the per-row state histogram in lineage rows. */
  val names: Array[String] = {
    val a = new Array[String](82)
    a(None) = "none"; a(AfterAttrName) = "after_attr_name"
    a(AfterAttrValueQuoted) = "after_attr_value_quoted"
    a(AfterDoctypeName) = "after_doctype_name"
    a(AfterDoctypePublicIdentifier) = "after_doctype_public_identifier"
    a(AfterDoctypePublicKeyword) = "after_doctype_public_keyword"
    a(AfterDoctypeSystemIdentifier) = "after_doctype_system_identifier"
    a(AfterDoctypeSystemKeyword) = "after_doctype_system_keyword"
    a(AmbiguousAmpersand) = "ambiguous_ampersand"; a(AttrName) = "attr_name"
    a(AttrValueDblQuoted) = "attr_value_dbl_quoted"
    a(AttrValueSglQuoted) = "attr_value_sgl_quoted"
    a(AttrValueUnquoted) = "attr_value_unquoted"
    a(BeforeAttrName) = "before_attr_name"; a(BeforeAttrValue) = "before_attr_value"
    a(BeforeDoctypeName) = "before_doctype_name"
    a(BeforeDoctypePublicIdentifier) = "before_doctype_public_identifier"
    a(BetweenDoctypePublicAndSystemIdentifiers) = "between_doctype_public_and_system_identifiers"
    a(BeforeDoctypeSystemIdentifier) = "before_doctype_system_identifier"
    a(BogusComment) = "bogus_comment"; a(BogusDoctype) = "bogus_doctype"
    a(CdataSection) = "cdata_section"; a(CdataSectionBracket) = "cdata_section_bracket"
    a(CdataSectionEnd) = "cdata_section_end"; a(CharReference) = "char_reference"
    a(Comment) = "comment"; a(CommentEnd) = "comment_end"
    a(CommentEndBang) = "comment_end_bang"; a(CommentEndDash) = "comment_end_dash"
    a(CommentLtSign) = "comment_lt_sign"; a(CommentLtSignBang) = "comment_lt_sign_bang"
    a(CommentLtSignBangDash) = "comment_lt_sign_bang_dash"
    a(CommentLtSignBangDashDash) = "comment_lt_sign_bang_dash_dash"
    a(CommentStart) = "comment_start"; a(CommentStartDash) = "comment_start_dash"
    a(Data) = "data"; a(DecimalCharReference) = "decimal_char_reference"
    a(DecimalCharReferenceStart) = "decimal_char_reference_start"
    a(Doctype) = "doctype"; a(DoctypeName) = "doctype_name"
    a(DoctypePublicIdentifierDblQuoted) = "doctype_public_identifier_dbl_quoted"
    a(DoctypePublicIdentifierSglQuoted) = "doctype_public_identifier_sgl_quoted"
    a(DoctypeSystemIdentifierDblQuoted) = "doctype_system_identifier_dbl_quoted"
    a(DoctypeSystemIdentifierSglQuoted) = "doctype_system_identifier_sgl_quoted"
    a(EndTagOpen) = "end_tag_open"; a(Eof) = "eof"
    a(HexCharReference) = "hex_char_reference"
    a(HexCharReferenceStart) = "hex_char_reference_start"
    a(MarkupDeclarationOpen) = "markup_declaration_open"
    a(NamedCharReference) = "named_char_reference"
    a(NumCharReference) = "num_char_reference"
    a(NumCharReferenceEnd) = "num_char_reference_end"
    a(Plaintext) = "plaintext"; a(Rawtext) = "rawtext"
    a(RawtextEndTagName) = "rawtext_end_tag_name"
    a(RawtextEndTagOpen) = "rawtext_end_tag_open"; a(RawtextLtSign) = "rawtext_lt_sign"
    a(Rcdata) = "rcdata"; a(RcdataEndTagName) = "rcdata_end_tag_name"
    a(RcdataEndTagOpen) = "rcdata_end_tag_open"; a(RcdataLtSign) = "rcdata_lt_sign"
    a(SelfClosingStartTag) = "self_closing_start_tag"; a(ScriptData) = "script_data"
    a(ScriptDataDoubleEscaped) = "script_data_double_escaped"
    a(ScriptDataDoubleEscapeEnd) = "script_data_double_escape_end"
    a(ScriptDataDoubleEscapeStart) = "script_data_double_escape_start"
    a(ScriptDataDoubleEscapedDash) = "script_data_double_escaped_dash"
    a(ScriptDataDoubleEscapedDashDash) = "script_data_double_escaped_dash_dash"
    a(ScriptDataDoubleEscapedLtSign) = "script_data_double_escaped_lt_sign"
    a(ScriptDataEndTagName) = "script_data_end_tag_name"
    a(ScriptDataEndTagOpen) = "script_data_end_tag_open"
    a(ScriptDataEscapeStart) = "script_data_escape_start"
    a(ScriptDataEscapeStartDash) = "script_data_escape_start_dash"
    a(ScriptDataEscaped) = "script_data_escaped"
    a(ScriptDataEscapedDash) = "script_data_escaped_dash"
    a(ScriptDataEscapedDashDash) = "script_data_escaped_dash_dash"
    a(ScriptDataEscapedEndTagOpen) = "script_data_escaped_end_tag_open"
    a(ScriptDataEscapedEndTagName) = "script_data_escaped_end_tag_name"
    a(ScriptDataEscapedLtSign) = "script_data_escaped_lt_sign"
    a(ScriptDataLtSign) = "script_data_lt_sign"
    a(TagName) = "tag_name"; a(TagOpen) = "tag_open"
    a
  }
}
