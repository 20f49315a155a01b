package graft.operators

import java.nio.file.{Files, Paths, Path}
import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}
import com.fasterxml.jackson.databind.node.{ObjectNode, ArrayNode}

/** JSON model persistence (reference: src/spark_bestfit/
  * serialization.py:39-261, storage.py:434-471, copula.py:392-468,
  * multivariate.py:255-341, mixture.py:316-421): every saved artifact
  * carries a schema_version and a type tag; pickle has no JVM meaning, so
  * JSON is the single portable surface. Jackson comes with Spark's own
  * classpath — no extra dependency.
  */
object Serialization {

  val SchemaVersion = 1
  private val mapper = new ObjectMapper()

  private def writeDoubles(node: ObjectNode, name: String, xs: Array[Double]): Unit = {
    val arr = node.putArray(name)
    xs.foreach(arr.add)
  }

  private def readDoubles(node: JsonNode, name: String): Array[Double] = {
    val arr = node.get(name)
    Array.tabulate(arr.size())(i => arr.get(i).asDouble())
  }

  private def writeMatrix(node: ObjectNode, name: String, m: Array[Array[Double]]): Unit = {
    val outer = node.putArray(name)
    m.foreach { row => val inner = outer.addArray(); row.foreach(inner.add) }
  }

  private def readMatrix(node: JsonNode, name: String): Array[Array[Double]] = {
    val outer = node.get(name)
    Array.tabulate(outer.size()) { i =>
      val row = outer.get(i)
      Array.tabulate(row.size())(j => row.get(j).asDouble())
    }
  }

  private def save(path: String, node: ObjectNode): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_: Path))
    Files.writeString(p, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
  }

  private def load(path: String, expectedType: String): JsonNode = {
    val node = mapper.readTree(Files.readString(Paths.get(path)))
    require(node.get("type").asText() == expectedType,
      s"expected type '$expectedType', found '${node.get("type").asText()}'")
    require(node.get("schema_version").asInt() <= SchemaVersion,
      s"unsupported schema_version ${node.get("schema_version").asInt()}")
    node
  }

  // ---- fitted distribution (S3) ----

  def saveFitResult(r: FitResult, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "fit_result")
    node.put("schema_version", SchemaVersion)
    node.put("column_name", r.column_name)
    node.put("distribution", r.distribution)
    writeDoubles(node, "parameters", r.parameters)
    node.put("sse", r.sse); node.put("aic", r.aic); node.put("bic", r.bic)
    r.ks_statistic.foreach(node.put("ks_statistic", _))
    r.pvalue.foreach(node.put("pvalue", _))
    r.ad_statistic.foreach(node.put("ad_statistic", _))
    r.ad_pvalue.foreach(node.put("ad_pvalue", _))
    node.put("data_min", r.data_min); node.put("data_max", r.data_max)
    node.put("data_mean", r.data_mean); node.put("data_stddev", r.data_stddev)
    node.put("data_count", r.data_count)
    node.put("data_kurtosis", r.data_kurtosis); node.put("data_skewness", r.data_skewness)
    r.lower_bound.foreach(node.put("lower_bound", _))
    r.upper_bound.foreach(node.put("upper_bound", _))
    node.put("fit_seconds", r.fit_seconds)
    save(path, node)
  }

  def loadFitResult(path: String): FitResult = {
    val n = load(path, "fit_result")
    def opt(name: String): Option[Double] =
      if (n.has(name)) Some(n.get(name).asDouble()) else None
    FitResult(
      n.get("column_name").asText(), n.get("distribution").asText(),
      readDoubles(n, "parameters"),
      n.get("sse").asDouble(), n.get("aic").asDouble(), n.get("bic").asDouble(),
      opt("ks_statistic"), opt("pvalue"), opt("ad_statistic"), opt("ad_pvalue"),
      n.get("data_min").asDouble(), n.get("data_max").asDouble(),
      n.get("data_mean").asDouble(), n.get("data_stddev").asDouble(),
      n.get("data_count").asDouble(),
      n.get("data_kurtosis").asDouble(), n.get("data_skewness").asDouble(),
      opt("lower_bound"), opt("upper_bound"),
      opt("fit_seconds").getOrElse(0.0))
  }

  // ---- copula (S5) ----

  def saveCopula(c: GaussianCopula, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "gaussian_copula")
    node.put("schema_version", SchemaVersion)
    val margs = node.putArray("marginals")
    c.marginals.foreach { m =>
      val mn = margs.addObject()
      mn.put("column", m.column)
      mn.put("distribution", m.distName)
      writeDoubles(mn, "parameters", m.params)
      m.lowerBound.foreach(mn.put("lower_bound", _))
      m.upperBound.foreach(mn.put("upper_bound", _))
    }
    writeMatrix(node, "correlation", c.correlation)
    save(path, node)
  }

  def loadCopula(path: String): GaussianCopula = {
    val n = load(path, "gaussian_copula")
    val margs = n.get("marginals")
    val marginals = (0 until margs.size()).map { i =>
      val m = margs.get(i)
      Marginal(
        m.get("column").asText(), m.get("distribution").asText(),
        readDoubles(m, "parameters"),
        if (m.has("lower_bound")) Some(m.get("lower_bound").asDouble()) else None,
        if (m.has("upper_bound")) Some(m.get("upper_bound").asDouble()) else None)
    }
    new GaussianCopula(marginals, readMatrix(n, "correlation"))
  }

  // ---- MVN (S5) ----

  def saveMvn(m: MultivariateNormalResult, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "multivariate_normal")
    node.put("schema_version", SchemaVersion)
    val cols = node.putArray("columns")
    m.columns.foreach(cols.add)
    writeDoubles(node, "mean", m.mean)
    writeMatrix(node, "cov", m.cov)
    node.put("sample_size", m.sampleSize)
    save(path, node)
  }

  def loadMvn(path: String): MultivariateNormalResult = {
    val n = load(path, "multivariate_normal")
    val cols = n.get("columns")
    MultivariateNormalResult(
      (0 until cols.size()).map(cols.get(_).asText()),
      readDoubles(n, "mean"), readMatrix(n, "cov"),
      n.get("sample_size").asLong())
  }

  // ---- GMM (S5) ----

  def saveGmm(g: GaussianMixtureResult, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "gaussian_mixture")
    node.put("schema_version", SchemaVersion)
    val cols = node.putArray("columns")
    g.columns.foreach(cols.add)
    writeDoubles(node, "weights", g.weights)
    writeMatrix(node, "means", g.means)
    val covs = node.putArray("covariances")
    g.covariances.foreach { m =>
      val mn = covs.addArray()
      m.foreach { row => val inner = mn.addArray(); row.foreach(inner.add) }
    }
    node.put("log_likelihood", g.logLikelihood)
    node.put("n", g.n)
    node.put("aic", g.aic); node.put("bic", g.bic)
    save(path, node)
  }

  def loadGmm(path: String): GaussianMixtureResult = {
    val n = load(path, "gaussian_mixture")
    val cols = n.get("columns")
    val covsNode = n.get("covariances")
    val covs = Array.tabulate(covsNode.size()) { c =>
      val m = covsNode.get(c)
      Array.tabulate(m.size()) { i =>
        val row = m.get(i)
        Array.tabulate(row.size())(j => row.get(j).asDouble())
      }
    }
    GaussianMixtureResult(
      (0 until cols.size()).map(cols.get(_).asText()),
      readDoubles(n, "weights"), readMatrix(n, "means"), covs,
      n.get("log_likelihood").asDouble(), n.get("n").asLong(),
      n.get("aic").asDouble(), n.get("bic").asDouble())
  }

  // ---- regression / survival / clustering models (engine-side) ----

  private def writeStrings(node: ObjectNode, name: String,
                           xs: Seq[String]): Unit = {
    val arr = node.putArray(name)
    xs.foreach(arr.add)
  }

  private def readStrings(node: JsonNode, name: String): Seq[String] = {
    val arr = node.get(name)
    (0 until arr.size()).map(arr.get(_).asText())
  }

  def saveLinear(m: Regression.LinearModel, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "linear_model")
    node.put("schema_version", SchemaVersion)
    writeStrings(node, "features", m.features)
    writeDoubles(node, "beta", m.beta)
    node.put("n", m.n); node.put("r2", m.r2)
    save(path, node)
  }

  def loadLinear(path: String): Regression.LinearModel = {
    val n = load(path, "linear_model")
    Regression.LinearModel(readStrings(n, "features"),
      readDoubles(n, "beta"), n.get("n").asLong(), n.get("r2").asDouble())
  }

  def saveLogistic(m: Regression.LogisticModel, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "logistic_model")
    node.put("schema_version", SchemaVersion)
    writeStrings(node, "features", m.features)
    writeDoubles(node, "beta", m.beta)
    node.put("log_likelihood", m.logLik)
    node.put("n", m.n); node.put("iterations", m.iterations)
    save(path, node)
  }

  def loadLogistic(path: String): Regression.LogisticModel = {
    val n = load(path, "logistic_model")
    Regression.LogisticModel(readStrings(n, "features"),
      readDoubles(n, "beta"), n.get("log_likelihood").asDouble(),
      n.get("n").asLong(), n.get("iterations").asInt())
  }

  def saveCox(m: Survival.CoxModel, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "cox_model")
    node.put("schema_version", SchemaVersion)
    writeStrings(node, "features", m.features)
    writeDoubles(node, "beta", m.beta)
    writeDoubles(node, "se", m.se)
    node.put("log_likelihood", m.logLik)
    node.put("log_likelihood_null", m.logLik0)
    node.put("n", m.n); node.put("n_events", m.nEvents)
    node.put("iterations", m.iters)
    save(path, node)
  }

  def loadCox(path: String): Survival.CoxModel = {
    val n = load(path, "cox_model")
    Survival.CoxModel(readStrings(n, "features"),
      readDoubles(n, "beta"), readDoubles(n, "se"),
      n.get("log_likelihood").asDouble(),
      n.get("log_likelihood_null").asDouble(),
      n.get("n").asLong(), n.get("n_events").asLong(),
      n.get("iterations").asInt())
  }

  def saveKMeans(m: Clustering.KMeansModel, path: String): Unit = {
    val node = mapper.createObjectNode()
    node.put("type", "kmeans_model")
    node.put("schema_version", SchemaVersion)
    writeMatrix(node, "centroids", m.centroids)
    val sizes = node.putArray("sizes")
    m.sizes.foreach(sizes.add)
    node.put("inertia", m.inertia)
    node.put("n", m.n); node.put("iterations", m.iters)
    save(path, node)
  }

  def loadKMeans(path: String): Clustering.KMeansModel = {
    val n = load(path, "kmeans_model")
    val sizes = n.get("sizes")
    Clustering.KMeansModel(readMatrix(n, "centroids"),
      Array.tabulate(sizes.size())(sizes.get(_).asLong()),
      n.get("inertia").asDouble(), n.get("n").asLong(),
      n.get("iterations").asInt())
  }
}
