// Golden generator for tests/data/javabin_goldens.tsv.gz: runs the
// reference's OWN JavaBinCodec (solr/solrj/src/java/org/apache/solr/
// common/util/JavaBinCodec.java) compiled standalone and hex-dumps the
// marshalled bytes for 51 representative values.
//
// Setup:
//   D=/tmp/javabin; mkdir -p $D/org/apache/solr/common/util $D/org/noggit
//   S=/root/reference/solr/solrj/src/java/org/apache/solr/common
//   cp $S/util/{JavaBinCodec,FastOutputStream,FastInputStream,\
//      DataInputInputStream,ByteUtils,NamedList,SimpleOrderedMap}.java \
//      $D/org/apache/solr/common/util/
//   cp $S/{SolrDocument,SolrDocumentList,SolrInputDocument,\
//      SolrInputField,EnumFieldValue}.java $D/org/apache/solr/common/
//   # plus two tiny shims: org/noggit/CharArr (reserve/write/setEnd) and
//   # org/apache/solr/common/SolrException (RuntimeException subclass)
//   (cd $D && javac -encoding UTF-8 GenGoldens.java org/**/*.java \
//      && java GenGoldens goldens.tsv)
import org.apache.solr.common.util.*;
import org.apache.solr.common.*;
import java.io.*;
import java.util.*;

public class GenGoldens {
  static String hex(byte[] b) {
    StringBuilder sb = new StringBuilder();
    for (byte x : b) sb.append(String.format("%02x", x));
    return sb.toString();
  }
  static String marshal(Object o) throws IOException {
    ByteArrayOutputStream bos = new ByteArrayOutputStream();
    new JavaBinCodec().marshal(o, bos);
    return hex(bos.toByteArray());
  }
  public static void main(String[] args) throws Exception {
    LinkedHashMap<String,Object> cases = new LinkedHashMap<>();
    cases.put("null", null);
    cases.put("true", Boolean.TRUE);
    cases.put("false", Boolean.FALSE);
    cases.put("int_0", 0);
    cases.put("int_7", 7);
    cases.put("int_14", 14);
    cases.put("int_15", 15);
    cases.put("int_16", 16);
    cases.put("int_127", 127);
    cases.put("int_255", 255);
    cases.put("int_100000", 100000);
    cases.put("int_neg1", -1);
    cases.put("int_neg100000", -100000);
    cases.put("int_max", Integer.MAX_VALUE);
    cases.put("int_min", Integer.MIN_VALUE);
    cases.put("long_0", 0L);
    cases.put("long_14", 14L);
    cases.put("long_15", 15L);
    cases.put("long_big", 123456789012345L);
    cases.put("long_neg1", -1L);
    cases.put("long_min", Long.MIN_VALUE);
    cases.put("long_top_byte", 0x7f00000000000000L);
    cases.put("float_1_5", 1.5f);
    cases.put("float_neg", -2.75f);
    cases.put("double_pi", 3.141592653589793d);
    cases.put("double_neg", -0.001d);
    cases.put("byte_5", (byte)5);
    cases.put("byte_neg", (byte)-3);
    cases.put("short_300", (short)300);
    cases.put("date_epoch", new Date(0L));
    cases.put("date_2026", new Date(1787212837878L));
    cases.put("str_empty", "");
    cases.put("str_ascii", "hello world");
    cases.put("str_30", "012345678901234567890123456789");
    cases.put("str_31", "0123456789012345678901234567890");
    cases.put("str_32", "01234567890123456789012345678901");
    cases.put("str_long", String.join("", Collections.nCopies(20, "0123456789")));
    cases.put("str_unicode", "café 中文 😀");
    cases.put("bytes", new byte[]{0, 1, (byte)0xfe, (byte)0xff});
    cases.put("list_mixed", Arrays.asList(1, "two", 3.0d, null, true));
    cases.put("list_empty", new ArrayList<>());
    List<Object> big = new ArrayList<>();
    for (int i = 0; i < 40; i++) big.add(i);
    cases.put("list_40", big);
    LinkedHashMap<Object,Object> m = new LinkedHashMap<>();
    m.put("a", 1); m.put("b", "two"); m.put(5, "five");
    cases.put("map", m);
    NamedList<Object> nl = new NamedList<>();
    nl.add("status", 0); nl.add("QTime", 12); nl.add("status", 1);
    cases.put("namedlist_dup", nl);
    SimpleOrderedMap<Object> som = new SimpleOrderedMap<>();
    som.add("echoParams", "all"); som.add("rows", 10);
    cases.put("simpleorderedmap", som);
    // extern string table: repeated keys across nested maps
    NamedList<Object> outer = new NamedList<>();
    SimpleOrderedMap<Object> d1 = new SimpleOrderedMap<>();
    d1.add("id", "1"); d1.add("score", 0.5f);
    SimpleOrderedMap<Object> d2 = new SimpleOrderedMap<>();
    d2.add("id", "2"); d2.add("score", 0.25f);
    outer.add("a", d1); outer.add("b", d2); outer.add("id", "top");
    cases.put("extern_strings", outer);
    // SolrDocument + SolrDocumentList — the query-response body
    SolrDocument doc1 = new SolrDocument();
    doc1.setField("id", "42"); doc1.setField("title", "hello");
    doc1.setField("score", 1.25f);
    doc1.setField("tags", Arrays.asList("a", "b"));
    SolrDocument doc2 = new SolrDocument();
    doc2.setField("id", "43"); doc2.setField("score", 0.75f);
    SolrDocumentList dl = new SolrDocumentList();
    dl.setNumFound(2); dl.setStart(0); dl.setMaxScore(1.25f);
    dl.add(doc1); dl.add(doc2);
    cases.put("solrdoclist", dl);
    SolrDocumentList dlNoMax = new SolrDocumentList();
    dlNoMax.setNumFound(0); dlNoMax.setStart(5);
    cases.put("solrdoclist_nomax", dlNoMax);
    // full select envelope
    NamedList<Object> resp = new NamedList<>();
    SimpleOrderedMap<Object> hdr = new SimpleOrderedMap<>();
    hdr.add("status", 0); hdr.add("QTime", 3);
    SimpleOrderedMap<Object> params = new SimpleOrderedMap<>();
    params.add("q", "title:hello"); params.add("wt", "javabin");
    hdr.add("params", params);
    resp.add("responseHeader", hdr);
    resp.add("response", dl);
    SimpleOrderedMap<Object> fc = new SimpleOrderedMap<>();
    NamedList<Object> ff = new NamedList<>();
    ff.add("en", 7L); ff.add("de", 3L);
    SimpleOrderedMap<Object> facetFields = new SimpleOrderedMap<>();
    facetFields.add("lang", ff);
    fc.add("facet_queries", new SimpleOrderedMap<Object>());
    fc.add("facet_fields", facetFields);
    resp.add("facet_counts", fc);
    cases.put("select_envelope", resp);
    // iterator tag
    cases.put("iterator", Arrays.asList("x", 1).iterator());
    // enum field value
    cases.put("enum_field", new EnumFieldValue(2, "signup"));
    // SolrInputDocument + the JavaBinUpdateRequestCodec envelope
    SolrInputDocument sid = new SolrInputDocument();
    sid.setField("id", "99");
    sid.setField("title", "hello", 2.0f);
    sid.setField("tags", Arrays.asList("x", "y"));
    cases.put("solrinputdoc", sid);
    NamedList<Object> up = new NamedList<>();
    NamedList<Object> uparams = new NamedList<>();
    uparams.add("commitWithin", -1);
    uparams.add("overwrite", true);
    up.add("params", uparams);
    up.add("delById", Arrays.asList("7", "8"));
    up.add("delByQ", Arrays.asList("lang:de"));
    List<SolrInputDocument> udocs = new ArrayList<>();
    SolrInputDocument u1 = new SolrInputDocument();
    u1.setField("id", "1"); u1.setField("text", "alpha");
    SolrInputDocument u2 = new SolrInputDocument();
    u2.setField("id", "2"); u2.setField("text", "beta");
    udocs.add(u1); udocs.add(u2);
    up.add("docs", udocs.iterator());
    cases.put("update_request", up);
    PrintWriter out = new PrintWriter(new OutputStreamWriter(new FileOutputStream(args[0]), "UTF-8"));
    for (Map.Entry<String,Object> e : cases.entrySet()) {
      out.println(e.getKey() + "\t" + marshal(e.getValue()));
    }
    out.flush(); out.close();
  }
}
